"""Model zoo shape/state tests + parameter-count parity with the
reference architectures."""
import jax
import jax.numpy as jnp
import numpy as np

from v2v_tpu.models.model import (ColorE2VID, E2VIDRecurrent, EVFlowNet,
                                  FireNet, FlowNet, FlowNetNoRecur, WFlowNet)

UNET_KWARGS = dict(
    num_bins=5, skip_type="sum", recurrent_block_type="convlstm",
    num_encoders=3, base_num_channels=32, num_residual_blocks=2,
    use_upsample_conv=True, final_activation="", norm="none")


def n_params(params):
    return sum(np.prod(p.shape) for p in jax.tree.leaves(params))


def test_e2vid_recurrent_forward_and_param_count():
    model = E2VIDRecurrent(unet_kwargs=UNET_KWARGS)
    b, h, w = 2, 32, 48
    x = jnp.ones((b, h, w, 5))
    state = model.init_state(b, h, w)
    params = model.init(jax.random.PRNGKey(0), x, state)
    # Parity: torch E2VIDRecurrent with these kwargs has 10,710,401 params
    # (head 4032 + encoders (51264+295168)+(204928+1180160)+(819456+4719616)
    #  + 2 resblocks 2*1180160 + decoders 819328+204864+51232 + pred 33).
    assert n_params(params) == 10710401

    out, state1 = model.apply(params, x, state)
    assert out["image"].shape == (b, h, w, 1)
    out2, state2 = model.apply(params, x, state1)
    # recurrence must matter: same input, different state -> different output
    assert not np.allclose(out["image"], out2["image"])
    # state pytree structure is stable across steps
    assert jax.tree.structure(state1) == jax.tree.structure(state2)


def test_e2vid_convgru_variant():
    kwargs = dict(UNET_KWARGS, recurrent_block_type="convgru")
    model = E2VIDRecurrent(unet_kwargs=kwargs)
    x = jnp.ones((1, 16, 16, 5))
    state = model.init_state(1, 16, 16)
    params = model.init(jax.random.PRNGKey(0), x, state)
    out, _ = model.apply(params, x, state)
    assert out["image"].shape == (1, 16, 16, 1)


def test_flownet_outputs_image_and_flow():
    model = FlowNet(unet_kwargs=dict(UNET_KWARGS, num_output_channels=3))
    b, h, w = 1, 32, 32
    x = jnp.ones((b, h, w, 5))
    state = model.init_state(b, h, w)
    params = model.init(jax.random.PRNGKey(0), x, state)
    out, _ = model.apply(params, x, state)
    assert out["image"].shape == (b, h, w, 1)
    assert out["flow"].shape == (b, h, w, 2)


def test_wflownet():
    model = WFlowNet(unet_kwargs=UNET_KWARGS)
    b, h, w = 1, 32, 32
    x = jnp.ones((b, h, w, 5))
    state = model.init_state(b, h, w)
    params = model.init(jax.random.PRNGKey(0), x, state)
    out, _ = model.apply(params, x, state)
    assert out["image"].shape == (b, h, w, 1)
    assert out["flow"].shape == (b, h, w, 2)


def test_evflownet_param_count_and_shapes():
    model = EVFlowNet(unet_kwargs=dict(num_bins=5))
    b, h, w = 1, 64, 64
    x = jnp.ones((b, h, w, 5))
    params = model.init(jax.random.PRNGKey(0), x)
    out, _ = model.apply(params, x)
    assert out["flow"].shape == (b, h, w, 2)
    assert out["image"].shape == (b, h, w, 1)
    assert float(jnp.abs(out["image"]).max()) == 0.0  # dummy image


def test_firenet():
    model = FireNet(unet_kwargs={"num_bins": 5})
    b, h, w = 2, 24, 24
    x = jnp.ones((b, h, w, 5))
    state = model.init_state(b, h, w)
    params = model.init(jax.random.PRNGKey(0), x, state)
    out, state1 = model.apply(params, x, state)
    assert out["image"].shape == (b, h, w, 1)
    assert len(state1) == 2


def test_colore2vid_3channel():
    model = ColorE2VID(unet_kwargs=UNET_KWARGS)
    b, h, w = 1, 16, 16
    x = jnp.ones((b, h, w, 5))
    state = model.init_state(b, h, w)
    params = model.init(jax.random.PRNGKey(0), x, state)
    out, _ = model.apply(params, x, state)
    assert out["image"].shape == (b, h, w, 3)


def test_flownet_norecur():
    model = FlowNetNoRecur(unet_kwargs=UNET_KWARGS)
    x = jnp.ones((1, 32, 32, 5))
    params = model.init(jax.random.PRNGKey(0), x)
    out, _ = model.apply(params, x)
    assert out["image"].shape == (1, 32, 32, 1)
    assert out["flow"].shape == (1, 32, 32, 2)


def test_scan_over_time():
    """The lax.scan time loop — the idiomatic replacement for the
    reference's python loop (model/train_utils.py:339-345)."""
    model = E2VIDRecurrent(unet_kwargs=UNET_KWARGS)
    b, t, h, w = 1, 4, 16, 16
    voxels = jax.random.normal(jax.random.PRNGKey(1), (b, t, h, w, 5))
    state = model.init_state(b, h, w)
    params = model.init(jax.random.PRNGKey(0), voxels[:, 0], state)

    def step(state, x):
        out, state = model.apply(params, x, state)
        return state, out["image"]

    _, imgs = jax.lax.scan(step, state, jnp.swapaxes(voxels, 0, 1))
    assert imgs.shape == (t, b, h, w, 1)
    # all timesteps distinct (state evolves)
    assert not np.allclose(imgs[0], imgs[-1])
