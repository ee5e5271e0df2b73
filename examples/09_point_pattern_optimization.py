"""Overlap-regularized point-pattern optimization.

Restores the reference's empty examples/09_point_pattern_optimization.py;
semantics of rasterization.py:564-642 (test_point_reg): Adam on 2D point
coordinates, L1(softor, sum) overlap loss, clamp to [0, 1].
"""

import jax
import numpy as np

from _common import out_dir

from fireflies_tpu import optim
from fireflies_tpu.graphics import rasterization
from fireflies_tpu.utils.png import write_png

if __name__ == "__main__":
    key = jax.random.key(0)
    res = optim.optimize_point_pattern(
        key, n_points=150, sigma=100.0, texture_size=(256, 256), steps=150,
        learning_rate=2e-3, chunk=50,
    )
    print(f"loss {float(res.losses[0]):.5f} -> {float(res.losses[-1]):.5f}")

    d = out_dir("09_point_pattern_optimization")
    before = rasterization.softor_points(
        jax.random.uniform(key, (150, 2)), 100.0, (256, 256), chunk=50
    )
    after = rasterization.softor_points(res.points, 100.0, (256, 256), chunk=50)
    write_png(str(d / "before.png"), np.asarray(before))
    write_png(str(d / "after.png"), np.asarray(after))
    np.save(d / "points.npy", np.asarray(res.points))
    print("wrote before/after to", d)
