from .depth_net import RootNet  # noqa: F401
from .full_net import FullNetConfig, RootNetwithRegInt, build_full_net  # noqa: F401
from .hrnet import HRNet  # noqa: F401
from .integral import integral_joint_decode, integral_pose_decode  # noqa: F401
from .resnet import ResNet  # noqa: F401
