"""ColorNet: color inference by splitting the event tensor into RGBW
Bayer sub-channels and running a grayscale recurrent model on each with
its own state (reference model/model.py:27-77). Host-orchestrated
inference wrapper (not a training model)."""
from __future__ import annotations

from typing import Any, Dict

import jax.numpy as jnp
import numpy as np

from ..ops.pad import CropParameters
from ..utils.color import merge_channels_into_color_image

_CHANNELS = {
    "R": (slice(0, None, 2), slice(0, None, 2)),
    "G": (slice(0, None, 2), slice(1, None, 2)),
    "B": (slice(1, None, 2), slice(1, None, 2)),
    "W": (slice(1, None, 2), slice(0, None, 2)),
    "grayscale": (slice(None), slice(None)),
}


class ColorNet:
    """Wraps a (model, params) pair with per-channel streaming state."""

    def __init__(self, model, params, num_encoders: int = 3):
        self.model = model
        self.params = params
        self.num_encoders = num_encoders
        self.states: Dict[str, Any] = {}

    def reset_states(self) -> None:
        self.states = {}

    def __call__(self, event_tensor: np.ndarray) -> Dict[str, np.ndarray]:
        """event_tensor: (1, H, W, bins). Returns {'image': (H, W, 3)
        BGR uint8}."""
        h, w = event_tensor.shape[1:3]
        crop_full = CropParameters(w, h, self.num_encoders)
        crop_half = CropParameters(w // 2, h // 2, self.num_encoders)
        recs = {}
        for name, (sy, sx) in _CHANNELS.items():
            ev = event_tensor[:, sy, sx, :]
            crop = crop_full if name == "grayscale" else crop_half
            ev = crop.pad(jnp.asarray(ev))
            if name not in self.states:
                self.states[name] = self.model.init_state(
                    1, ev.shape[1], ev.shape[2])
            out, self.states[name] = self.model.apply(
                self.params, ev, self.states[name])
            img = crop.crop(out["image"])
            img = np.asarray(img)[0, :, :, 0]
            recs[name] = np.clip(img * 255, 0, 255).astype(np.uint8)
        return {"image": merge_channels_into_color_image(recs)}
