from .solver import pnp_pose, pnp_pose_rt, reproject  # noqa: F401
