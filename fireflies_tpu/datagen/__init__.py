"""Dataset generation: the reference main.py production workload, batched.

The reference loops serially — randomize, render, post-process, reject,
imwrite, 10,000 times (main.py:147-193).  Here the whole
randomize -> render -> segment -> post-process chain is one jitted, vmapped
function producing a *batch* of candidate frames per device dispatch;
rejection filtering (empty segmentation / too many connected components,
main.py:168-180) runs on the host over the batch, and accepted frames are
written out.  Checkpoint/resume is by frame count (SURVEY.md §5): re-running
with the same out_dir continues after the last saved index.
"""

from __future__ import annotations

import dataclasses
import os
from pathlib import Path
from typing import Callable, Optional

import numpy as np

import jax
import jax.numpy as jnp

from fireflies_tpu.utils.png import write_png

Array = jax.Array


def connected_components(mask: np.ndarray) -> int:
    """Count 4-connected components of a binary mask (host-side replacement
    for cv2.connectedComponentsWithStats, main.py:175)."""
    try:
        from fireflies_tpu.native import connected_components as native_cc  # noqa: PLC0415

        return native_cc(np.ascontiguousarray(mask.astype(np.uint8)))
    except Exception:
        pass
    mask = mask.astype(bool)
    h, w = mask.shape
    labels = np.zeros((h, w), np.int32)
    current = 0
    stack: list[tuple[int, int]] = []
    for sy in range(h):
        for sx in range(w):
            if mask[sy, sx] and labels[sy, sx] == 0:
                current += 1
                stack.append((sy, sx))
                labels[sy, sx] = current
                while stack:
                    y, x = stack.pop()
                    for ny, nx in ((y - 1, x), (y + 1, x), (y, x - 1), (y, x + 1)):
                        if 0 <= ny < h and 0 <= nx < w and mask[ny, nx] and labels[ny, nx] == 0:
                            labels[ny, nx] = current
                            stack.append((ny, nx))
    return current


@dataclasses.dataclass
class RejectionConfig:
    """Data-quality filters (reference main.py:168-180)."""

    min_coverage: float = 0.001  # non-empty segmentation
    max_components: int = 3
    target_mesh_id: Optional[int] = None  # component check on one mesh's mask


def default_frame_filter(rejection: RejectionConfig) -> Callable[[np.ndarray], bool]:
    def keep(seg: np.ndarray) -> bool:
        mask = seg == rejection.target_mesh_id if rejection.target_mesh_id else seg > 0
        if mask.mean() < rejection.min_coverage:
            return False
        return connected_components(mask) <= rejection.max_components

    return keep


def generate_dataset(
    render_batch_fn: Callable[[Array, Array], tuple[Array, Array]],
    n_frames: int,
    out_dir: str | os.PathLike,
    key: Array,
    batch: int = 8,
    rejection: RejectionConfig | None = None,
    eval_mode: bool = False,
    max_dispatches: Optional[int] = None,
) -> int:
    """Produce `n_frames` accepted (image, segmentation) pairs.

    render_batch_fn(keys (B,), steps (B,)) -> (images (B,H,W[,C]),
    segmentations (B,H,W)); typically `jit(vmap(...))` over the scene's
    randomize+render+postprocess chain.

    Resumes from existing frames in out_dir.  Returns the number of frames
    now present.
    """
    out = Path(out_dir)
    (out / "images").mkdir(parents=True, exist_ok=True)
    (out / "segmentations").mkdir(parents=True, exist_ok=True)
    keep = default_frame_filter(rejection or RejectionConfig())

    count = len(list((out / "images").glob("*.png")))
    step_base = count
    dispatch = 0
    while count < n_frames:
        if max_dispatches is not None and dispatch >= max_dispatches:
            break
        key, sub = jax.random.split(key)
        keys = jax.random.split(sub, batch)
        steps = jnp.arange(step_base + dispatch * batch, step_base + (dispatch + 1) * batch)
        images, segs = render_batch_fn(keys, steps)
        images = np.asarray(images)
        segs = np.asarray(segs)
        for i in range(batch):
            if count >= n_frames:
                break
            if not keep(segs[i]):
                continue
            write_png(str(out / "images" / f"{count:05d}.png"), images[i])
            seg_vis = (segs[i] > 0).astype(np.uint8) * 255
            write_png(str(out / "segmentations" / f"{count:05d}.png"), seg_vis)
            count += 1
        dispatch += 1
    return count


def generate_dataset_parallel(
    render_fn: Callable[[Array, Array], tuple[Array, Array]],
    n_frames: int,
    out_dir: str | os.PathLike,
    key: Array,
    mesh,
    per_device: int = 4,
    **kwargs,
) -> int:
    """generate_dataset scaled across a device mesh (reference main.py's
    10k-frame loop as one SPMD dispatch per batch).

    `render_fn(key, step) -> (image, segmentation)` renders ONE frame; it is
    lifted with parallel.variant_parallel so each dispatch renders
    n_devices * per_device frames, one variant batch per device, sharded
    over `mesh`.  Host-side rejection + PNG writing consume the gathered
    batch exactly as in the single-chip path (np.asarray on the sharded
    output is the device->host gather).  kwargs pass through to
    generate_dataset (rejection, eval_mode, max_dispatches).
    """
    import jax  # noqa: PLC0415

    from fireflies_tpu import parallel  # noqa: PLC0415

    batched = jax.jit(parallel.variant_parallel(render_fn, mesh))
    batch = int(np.prod([mesh.shape[a] for a in mesh.axis_names])) * per_device
    return generate_dataset(
        batched, n_frames, out_dir, key, batch=batch, **kwargs
    )


def spp_buckets(
    key: Array, buckets: tuple[int, ...] = (1, 2, 4, 8, 16, 32, 64)
) -> int:
    """Host-side spp choice for the next dispatch.

    The reference randomizes spp per frame with U[1, 100] (main.py:144,156);
    under jit spp is a static shape, so the TPU-native equivalent buckets it:
    pick a bucket on the host per dispatch (each bucket compiles once, then
    caches).  Returns a Python int for RenderConfig.replace(spp=...).
    """
    import jax  # noqa: PLC0415

    idx = int(jax.random.randint(key, (), 0, len(buckets)))
    return int(buckets[idx])


def tonemap(img: Array, exposure: float = 1.0) -> Array:
    """Simple Reinhard tonemap + clamp for HDR render output."""
    x = img * exposure
    return jnp.clip(x / (1.0 + x), 0.0, 1.0)


def to_grayscale(img: Array) -> Array:
    if img.ndim == 3 and img.shape[-1] == 3:
        return 0.2126 * img[..., 0] + 0.7152 * img[..., 1] + 0.0722 * img[..., 2]
    return img
