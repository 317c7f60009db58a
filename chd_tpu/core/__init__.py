from . import quat
from .skeleton import Skeleton, children_list, descendants_mask, ancestors_mask
from .animation import Animation
from . import fk
from . import bvh
