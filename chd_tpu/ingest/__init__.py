from . import openpose
from . import totalcap
from .one_euro import one_euro_filter
