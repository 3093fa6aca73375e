from .mesh import RobotMesh, default_link_meshes, load_mesh, load_obj, load_stl  # noqa: F401
from .silhouette import soft_silhouette, soft_silhouette_batch  # noqa: F401
