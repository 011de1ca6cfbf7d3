from .mesh import make_mesh, sharded_ba_step  # noqa: F401
