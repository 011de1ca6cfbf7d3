"""Device-mesh and multi-host scale-out layer.

Lazy exports: importing this package must not initialize the XLA backend
(``jax.distributed.initialize`` has to run first in multi-process jobs --
parallel/dist.py), so the heavy submodules load on first attribute access.
"""

_EXPORTS = {
    "make_mesh": "mesh",
    "make_mesh_2d": "mesh",
    "sharded_ba_step": "mesh",
    "make_sharded_ba_iteration": "shard_ba",
}


def __getattr__(name):
    if name in _EXPORTS:
        import importlib

        mod = importlib.import_module(f".{_EXPORTS[name]}", __name__)
        return getattr(mod, name)
    if name in ("mesh", "shard_ba", "dist", "dist_worker"):
        import importlib

        return importlib.import_module(f".{name}", __name__)
    raise AttributeError(name)
