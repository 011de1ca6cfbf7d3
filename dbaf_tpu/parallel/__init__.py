from .mesh import make_mesh, make_mesh_2d, sharded_ba_step  # noqa: F401
