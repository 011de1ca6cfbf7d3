"""DBA-Fusion TPU: a TPU-native tightly-coupled VIO/SLAM framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
GREAT-WHU/DBA-Fusion (dense bundle adjustment tightly coupled with a
multi-sensor factor graph), built TPU-first:

- ``ops``      -- SE(3) Lie math, projective geometry, correlation kernels,
                  and the dense-bundle-adjustment linear-system builder/solver
                  (MXU-friendly batched einsums + dense Schur elimination).
- ``models``   -- the DROID-style network (feature/context encoders, ConvGRU
                  update operator) in Flax, plus a PyTorch-checkpoint
                  converter for the published TartanAir weights.
- ``fusion``   -- JAX-native factor graph: IMU preintegration, GNSS/odometry
                  factors, sliding-window marginalization, LM on manifolds
                  (replaces the reference's GTSAM fork).
- ``slam``     -- streaming state (keyframe ring buffer), motion filter,
                  covisibility graph, frontend driver, system facade.
- ``parallel`` -- device-mesh scale-out: edge-sharded DBA with psum Schur
                  reduction via shard_map.
- ``utils``    -- typed configuration, trajectory IO, geodesy, profiling.
- ``data``     -- dataset streams (TUM-VI, KITTI-360, WHU, SubT) + HDF5 tools.
- ``eval``     -- ATE evaluation and reconstruction export.
"""

__version__ = "0.1.0"
