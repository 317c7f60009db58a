from . import gapfill
from . import windows
from . import voting
