"""Constrained optimization (reference: gtsam/constrained/ —
NonlinearEqualityConstraint.h, NonlinearInequalityConstraint.h, penalty
building blocks)."""

from gtsam_petercdev_tpu.constrained.constrained import (
    EqualityConstraint,
    InequalityConstraint,
    PenaltyParams,
    penalty_optimize,
    augmented_lagrangian_optimize,
)
