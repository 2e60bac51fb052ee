"""Independent numpy golden model of the ESIM event emulator.

Implements the published V2V simulator semantics (reference:
data/v2v_core_esim.py) directly from the spec, as the ground truth the
device kernels are validated against: reverse gamma (2.2), log-intensity
diff integration into a membrane potential, multi-event quantization by
float floor-division with threshold subtraction, gaussian base noise per
frame and a persistent hot-pixel noise field.
"""
import numpy as np


def golden_video_to_voxel(
    video: np.ndarray,
    pos_thres: float = 0.2,
    neg_thres: float = 0.2,
    base_noise: np.ndarray | None = None,     # (N-1, H, W) or None
    hot_noise: np.ndarray | None = None,      # (H, W) or None
    init_potential: np.ndarray | None = None,  # (H, W) or None
    put_noise_external: bool = False,
    dtype=np.float32,
) -> np.ndarray:
    video = video.astype(dtype)
    n, h, w = video.shape
    pot = (np.zeros((h, w), dtype) if init_potential is None
           else init_potential.astype(dtype))
    if base_noise is None:
        base_noise = np.zeros((n - 1, h, w), dtype)
    if hot_noise is None:
        hot_noise = np.zeros((h, w), dtype)

    lin = (video / dtype(255.0)) ** dtype(2.2) * dtype(255.0)
    log_imgs = np.log(dtype(0.001) + lin / dtype(255.0))

    out = np.empty((n - 1, h, w), dtype)
    for i in range(n - 1):
        pot = pot + (log_imgs[i + 1] - log_imgs[i])
        if not put_noise_external:
            pot = pot + base_noise[i] + hot_noise
        pos_ev = np.where(pot >= pos_thres, np.floor_divide(pot, pos_thres), 0)
        neg_ev = np.where(pot <= -neg_thres, np.floor_divide(-pot, neg_thres), 0)
        pot = pot - pos_ev * pos_thres + neg_ev * neg_thres
        frame = pos_ev - neg_ev
        if put_noise_external:
            frame = frame + base_noise[i] + hot_noise
        out[i] = frame
    return out
