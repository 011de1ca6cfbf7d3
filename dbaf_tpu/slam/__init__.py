from .video import DepthVideo  # noqa: F401
from .graph import CovisibleGraph  # noqa: F401
from .motion_filter import MotionFilter  # noqa: F401
from .frontend import Frontend  # noqa: F401
from .system import DBAFusion  # noqa: F401
