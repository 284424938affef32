"""Function bases (reference: gtsam/basis/ — Chebyshev2.h, FourierBasis,
FitBasis.h). TPU-native: every basis is a dense weight-matrix generator, so
evaluation/differentiation of fitted functions are plain matmuls (MXU)."""

from gtsam_petercdev_tpu.basis.chebyshev import (
    chebyshev2_points,
    chebyshev2_weights,
    chebyshev2_derivative_weights,
    chebyshev2_differentiation_matrix,
    chebyshev2_integration_weights,
    chebyshev1_weights,
)
from gtsam_petercdev_tpu.basis.fourier import fourier_weights, fourier_derivative_weights
from gtsam_petercdev_tpu.basis.fit import FitBasis, evaluation_factor
