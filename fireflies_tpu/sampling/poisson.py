"""Blue-noise point generation.

Two implementations:

* ``bridson(radius_map, k)`` — Bridson (2007) Poisson-disk sampling with a
  spatially varying radius map, matching the reference's host-side generator
  (fireflies/sampling/poisson.py:16-117).  Inherently sequential; runs on the
  host in numpy.  It is setup-time only (pattern initialization), never inside
  a jit trace.  If the native C++ extension is available it is used instead.

* ``dart_throwing(key, n_points, radius, ...)`` — a bounded-iteration,
  jit-compatible approximate blue-noise sampler for in-graph use (fixed output
  shape, rejection by masking).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

Array = jax.Array


def bridson(
    radius_map: np.ndarray,
    k: int = 30,
    seed: int | None = None,
    radius_type: str = "default",
) -> tuple[int, np.ndarray]:
    """Poisson-disk sampling over a [0,H)x[0,W) domain with per-pixel radii.

    Args:
      radius_map: (H, W) array; the minimum-distance radius at each location.
        A constant map gives classic Poisson-disk; a variance-derived map gives
        the reference's SMARTY density control.
      k: candidate attempts per active point (Bridson's k).
      seed: optional RNG seed.
      radius_type: candidate-distance distribution around an active point
        (reference poisson.py:64-68): "default" draws rho ~ U(r, 2r) (the
        classic annulus); "normDist" draws rho ~ N(1.5 r, 0.2 r), giving a
        tighter, more regular spacing distribution.

    Returns:
      (n, coords): number of samples and an (n, 2) float array of (y, x).
    """
    if radius_type not in ("default", "normDist"):
        raise ValueError(f"radius_type must be 'default' or 'normDist', got {radius_type!r}")
    if radius_type == "default":
        try:
            from fireflies_tpu.native import bridson as native_bridson  # noqa: PLC0415

            return native_bridson(np.asarray(radius_map, np.float32), k, seed or 0)
        except Exception:
            pass
    return _bridson_numpy(radius_map, k, seed, radius_type)


def _bridson_numpy(radius_map, k=30, seed=None, radius_type="default"):
    rng = np.random.default_rng(seed)
    radius_map = np.asarray(radius_map, np.float64)
    height, width = radius_map.shape
    r_min = float(radius_map.min())
    r_min = max(r_min, 1e-3)

    # Background grid sized by the smallest radius so any cell holds <= 1 point.
    cell = r_min / np.sqrt(2.0)
    gh = int(np.ceil(height / cell)) + 1
    gw = int(np.ceil(width / cell)) + 1
    grid = -np.ones((gh, gw), np.int64)

    points: list[np.ndarray] = []
    active: list[int] = []

    def grid_idx(p):
        return int(p[0] // cell), int(p[1] // cell)

    def fits(p, radius):
        gy, gx = grid_idx(p)
        # Neighborhood size must cover the *largest* radius that could
        # conflict; conservative: scan radius of this point's radius.
        reach = int(np.ceil(radius / cell)) + 1
        y0, y1 = max(gy - reach, 0), min(gy + reach + 1, gh)
        x0, x1 = max(gx - reach, 0), min(gx + reach + 1, gw)
        neighbors = grid[y0:y1, x0:x1]
        idx = neighbors[neighbors >= 0]
        if idx.size == 0:
            return True
        pts = np.stack([points[i] for i in idx])
        d2 = np.sum((pts - p) ** 2, axis=1)
        return bool(np.all(d2 >= radius * radius))

    def insert(p):
        points.append(p)
        gy, gx = grid_idx(p)
        grid[gy, gx] = len(points) - 1
        active.append(len(points) - 1)

    first = np.array([rng.uniform(0, height), rng.uniform(0, width)])
    insert(first)

    while active:
        pick = rng.integers(len(active))
        base_i = active[pick]
        base = points[base_i]
        by = min(int(base[0]), height - 1)
        bx = min(int(base[1]), width - 1)
        radius = max(float(radius_map[by, bx]), r_min)

        placed = False
        for _ in range(k):
            if radius_type == "normDist":
                rho = radius * rng.normal(1.5, 0.2)
            else:
                rho = rng.uniform(radius, 2 * radius)
            theta = rng.uniform(0, 2 * np.pi)
            cand = base + rho * np.array([np.sin(theta), np.cos(theta)])
            if not (0 <= cand[0] < height and 0 <= cand[1] < width):
                continue
            cy, cx = int(cand[0]), int(cand[1])
            cand_r = max(float(radius_map[cy, cx]), r_min)
            if fits(cand, cand_r):
                insert(cand)
                placed = True
                break
        if not placed:
            active.pop(pick)

    coords = np.stack(points) if points else np.zeros((0, 2))
    return len(points), coords


def dart_throwing(
    key: Array,
    n_points: int,
    radius: float,
    extent: tuple[float, float] = (1.0, 1.0),
    oversample: int = 8,
) -> tuple[Array, Array]:
    """Jit-compatible approximate blue noise with fixed output shape.

    Draws ``n_points * oversample`` uniform candidates, then greedily accepts
    candidates at least ``radius`` from all previously accepted ones via a
    sequential ``lax.scan`` over candidates (O(N^2) distance checks, fine for
    the few hundred points structured-light patterns use).

    Returns:
      (points, valid): (n_points, 2) coordinates in [0, extent) and a
      (n_points,) bool mask; invalid slots repeat the last accepted point.
    """
    n_cand = n_points * oversample
    ext = jnp.asarray(extent, jnp.float32)
    cands = jax.random.uniform(key, (n_cand, 2)) * ext

    r2 = jnp.float32(radius * radius)
    big = jnp.float32(1e9)

    def body(carry, cand):
        accepted, count = carry
        d2 = jnp.sum((accepted - cand) ** 2, axis=-1)
        # Slots >= count are placeholders at +inf distance.
        live = jnp.arange(n_points) < count
        min_d2 = jnp.min(jnp.where(live, d2, big))
        ok = (min_d2 >= r2) & (count < n_points)
        accepted = jnp.where(
            (jnp.arange(n_points) == count)[:, None] & ok, cand[None, :], accepted
        )
        return (accepted, count + ok.astype(jnp.int32)), None

    init = (jnp.zeros((n_points, 2), jnp.float32), jnp.asarray(0, jnp.int32))
    (points, count), _ = jax.lax.scan(body, init, cands)
    valid = jnp.arange(n_points) < count
    # Back-fill invalid slots with the first point to keep downstream math sane.
    points = jnp.where(valid[:, None], points, points[0][None, :])
    return points, valid
