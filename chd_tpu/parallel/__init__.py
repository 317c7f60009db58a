from .mesh import make_mesh, shard_batch, replicate, contact_model_shardings
from .distributed import initialize as distributed_initialize
from .distributed import make_global_mesh, shard_global_batch
from .longseq import lm_solve_frame_sharded
