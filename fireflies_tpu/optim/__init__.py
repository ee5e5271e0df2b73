from fireflies_tpu.optim.inverse import (
    InverseResult,
    hybrid_pose_loss,
    image_l2,
    optimize_params,
)
from fireflies_tpu.optim.pattern import (
    PatternOptResult,
    RenderOptResult,
    dot_coverage_objective,
    make_variant_loss,
    optimize_pattern_through_render,
    optimize_point_pattern,
    overlap_loss,
)

__all__ = [
    "overlap_loss",
    "optimize_point_pattern",
    "optimize_pattern_through_render",
    "make_variant_loss",
    "dot_coverage_objective",
    "optimize_params",
    "hybrid_pose_loss",
    "image_l2",
    "PatternOptResult",
    "RenderOptResult",
    "InverseResult",
]
