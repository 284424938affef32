"""gtsam_petercdev_tpu — a TPU-native factor-graph smoothing-and-mapping engine.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of GTSAM
(reference: PeterCalifano/gtsam_PeterCdev, C++17). Architecture inverts the
reference's pointer-heavy interpreter design: all numerics live in fixed-shape
batched arrays on device; all irregularity (variable ordering, elimination-tree
construction, scheduling) lives on host as a plan/compile phase.

Layer map (mirrors reference layers; see SURVEY.md §1):
  core/       Keys & Symbols, manifold traits protocol      (~ gtsam/base traits)
  geometry/   Lie groups & manifolds: SO(2/3), SE(2/3), ...  (~ gtsam/geometry)
  linear/     Gaussian factors, noise models, solvers        (~ gtsam/linear)
  inference/  symbolic planning: ordering, etree, cliques    (~ gtsam/inference)
  nonlinear/  Values, factor batches, GN/LM/Dogleg, iSAM2    (~ gtsam/nonlinear)
  slam/ sfm/ navigation/  domain factor libraries            (~ gtsam/{slam,sfm,navigation})
  discrete/ hybrid/  discrete & hybrid inference             (~ gtsam/{discrete,hybrid})
  ops/        Pallas TPU kernels for the hot paths
  parallel/   device meshes, sharding, distributed reduction
  utils/      dataset I/O (g2o/BAL/TORO), timing, plotting
  models/     flagship end-to-end pipelines (pose-SLAM, BA, VIO)
"""

__version__ = "0.1.0"

from gtsam_petercdev_tpu.core.keys import Symbol, symbol, symbol_chr, symbol_index
