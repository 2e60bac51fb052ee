"""Render one simulator sample as images: frames, voxel bin sums, and a
3D-ish scatter of event counts (reference
scripts/visualize_esim_sample.py, used for paper figures).

Usage: python scripts/visualize_esim_sample.py <video.mp4|synthetic> <out_dir>
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(source: str, out_dir: str) -> None:
    import cv2
    import jax
    import jax.numpy as jnp
    from v2v_tpu.ops.voxel import SimConfig, simulate_sequence

    os.makedirs(out_dir, exist_ok=True)
    n, h, w = 41, 128, 128
    if source == "synthetic":
        xx = np.mgrid[0:h, 0:w][1]
        frames = np.stack([((xx + 2.0 * t) % w) / w * 255
                           for t in range(n)]).astype(np.float32)
    else:
        cap = cv2.VideoCapture(source)
        frames = []
        for _ in range(n):
            ret, f = cap.read()
            if not ret:
                break
            g = cv2.cvtColor(f, cv2.COLOR_BGR2GRAY)
            frames.append(cv2.resize(g, (w, h)))
        cap.release()
        frames = np.stack(frames).astype(np.float32)

    voxels, params = simulate_sequence(jnp.asarray(frames),
                                       jax.random.PRNGKey(0), SimConfig(),
                                       num_bins=5)
    v = np.asarray(voxels)
    print(f"thresholds pos={float(params.pos_thres):.3f} "
          f"neg={float(params.neg_thres):.3f}")
    for i in range(v.shape[0]):
        s = v[i].sum(axis=0)
        lim = max(np.abs(s).max(), 1)
        vis = np.clip((s / lim + 1) / 2 * 255, 0, 255).astype(np.uint8)
        cv2.imwrite(os.path.join(out_dir, f"voxel_{i:03d}.png"), vis)
        cv2.imwrite(os.path.join(out_dir, f"frame_{i:03d}.png"),
                    frames[(i + 1) * 5].astype(np.uint8))
    print(f"wrote {2 * v.shape[0]} images to {out_dir}")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "synthetic",
         sys.argv[2] if len(sys.argv) > 2 else "debug/esim_sample")
