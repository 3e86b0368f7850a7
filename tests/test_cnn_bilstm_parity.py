"""Checkpoint-level parity: flax CNNBiLSTMHybrid vs the reference torch model.

The reference file cnn_bilstm_hybrid.py depends only on torch, so the test
instantiates the *actual* reference model, copies its weights into our flax
module, and compares forward passes. This validates the architecture contract
(including the LayerNorm-on-attention quirk) to float tolerance.
"""

import sys

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch

sys.path.insert(0, "/root/reference")

from audioanalysisdetector_tpu.models.cnn_bilstm import CNNBiLSTMHybrid
from audioanalysisdetector_tpu.models.lstm import BiLSTM, LSTMLayer


def _t2j(t):
    return jnp.asarray(t.detach().numpy())


def torch_lstm_params_to_flax(lstm, prefix=""):
    """Map torch.nn.LSTM (1 layer, bidirectional) params to our BiLSTM."""
    out = {}
    for direction, name in ((0, "fwd"), (1, "bwd")):
        sfx = "_reverse" if direction else ""
        out[name] = {
            "w_ih": _t2j(getattr(lstm, f"weight_ih_l0{sfx}").T),
            "w_hh": _t2j(getattr(lstm, f"weight_hh_l0{sfx}").T),
            "b_ih": _t2j(getattr(lstm, f"bias_ih_l0{sfx}")),
            "b_hh": _t2j(getattr(lstm, f"bias_hh_l0{sfx}")),
        }
    return out


def test_lstm_layer_matches_torch(rng):
    torch.manual_seed(0)
    t_lstm = torch.nn.LSTM(7, 5, batch_first=True, bidirectional=False)
    x = rng.standard_normal((3, 11, 7)).astype(np.float32)
    with torch.no_grad():
        ref, _ = t_lstm(torch.tensor(x))
    params = {
        "w_ih": _t2j(t_lstm.weight_ih_l0.T),
        "w_hh": _t2j(t_lstm.weight_hh_l0.T),
        "b_ih": _t2j(t_lstm.bias_ih_l0),
        "b_hh": _t2j(t_lstm.bias_hh_l0),
    }
    ours = LSTMLayer(hidden=5).apply({"params": params}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(), rtol=1e-5, atol=1e-5)


def test_bilstm_matches_torch(rng):
    torch.manual_seed(1)
    t_lstm = torch.nn.LSTM(8, 4, batch_first=True, bidirectional=True)
    x = rng.standard_normal((2, 9, 8)).astype(np.float32)
    with torch.no_grad():
        ref, _ = t_lstm(torch.tensor(x))
    params = torch_lstm_params_to_flax(t_lstm)
    ours = BiLSTM(hidden=4).apply({"params": params}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(), rtol=1e-5, atol=1e-5)


def test_flagship_matches_reference_model(rng):
    cnn_bilstm_hybrid = pytest.importorskip("cnn_bilstm_hybrid")
    torch.manual_seed(2)
    ref_model = cnn_bilstm_hybrid.AudioDeepfakeDetector()
    ref_model.eval()
    # randomize BN running stats so the test can't pass with identity stats
    with torch.no_grad():
        ref_model.feature_extractor[1].running_mean.uniform_(-0.5, 0.5)
        ref_model.feature_extractor[1].running_var.uniform_(0.5, 1.5)

    x = rng.standard_normal((4, 19, 63)).astype(np.float32)
    with torch.no_grad():
        ref_out = ref_model(torch.tensor(x)).numpy()

    conv = ref_model.feature_extractor[0]
    bn = ref_model.feature_extractor[1]
    params = {
        "conv": {"kernel": _t2j(conv.weight.permute(2, 1, 0)), "bias": _t2j(conv.bias)},
        "bn": {"scale": _t2j(bn.weight), "bias": _t2j(bn.bias)},
        "bilstm": torch_lstm_params_to_flax(ref_model.bilstm),
        "attention": {
            "kernel": _t2j(ref_model.attention.weight.T),
            "bias": _t2j(ref_model.attention.bias),
        },
        "layer_norm": {
            "scale": _t2j(ref_model.layer_norm.weight),
            "bias": _t2j(ref_model.layer_norm.bias),
        },
        "fc1": {
            "kernel": _t2j(ref_model.classifier[0].weight.T),
            "bias": _t2j(ref_model.classifier[0].bias),
        },
        "fc2": {
            "kernel": _t2j(ref_model.classifier[3].weight.T),
            "bias": _t2j(ref_model.classifier[3].bias),
        },
    }
    batch_stats = {
        "bn": {"mean": _t2j(bn.running_mean), "var": _t2j(bn.running_var)}
    }
    ours = CNNBiLSTMHybrid().apply(
        {"params": params, "batch_stats": batch_stats}, jnp.asarray(x), train=False
    )
    np.testing.assert_allclose(np.asarray(ours), ref_out, rtol=1e-5, atol=1e-5)


def test_flagship_init_and_shapes(rng):
    model = CNNBiLSTMHybrid()
    x = jnp.asarray(rng.standard_normal((8, 19, 63)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    out = model.apply(variables, x, train=False)
    assert out.shape == (8, 1)
    assert ((np.asarray(out) >= 0) & (np.asarray(out) <= 1)).all()


def test_flagship_fixed_attention_differs(rng):
    x = jnp.asarray(rng.standard_normal((2, 19, 63)).astype(np.float32))
    quirk = CNNBiLSTMHybrid(fixed_attention=False)
    v = quirk.init(jax.random.PRNGKey(0), x, train=False)
    # quirk path: LayerNorm collapses weights to its bias (0 at init)
    fixed = CNNBiLSTMHybrid(fixed_attention=True)
    v2 = fixed.init(jax.random.PRNGKey(0), x, train=False)
    out_q = np.asarray(quirk.apply(v, x, train=False))
    out_f = np.asarray(fixed.apply(v2, x, train=False))
    # quirk output is the constant sigmoid(fc2(relu(fc1(0)))) per batch row
    assert np.allclose(out_q, out_q[0], atol=1e-6)
    assert not np.allclose(out_f, out_f[0], atol=1e-6)
