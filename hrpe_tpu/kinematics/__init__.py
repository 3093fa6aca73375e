from .chain import FIXED, PRISMATIC, REVOLUTE, JointSpec, KinematicChain  # noqa: F401
from .robots import JOINT_NAMES, LINK_NAMES, ROBOT_DOF, ROBOT_NKPT, load_robot  # noqa: F401
from .urdf import chain_from_urdf, parse_urdf  # noqa: F401
