"""Layer-level parity of the functional layer library vs torch."""

import jax
import jax.numpy as jnp
import numpy as np
import torch

from cosyvoice2_eu_tpu.utils import params as P


def test_conv1d_matches_torch():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 6, 50)).astype(np.float32)
    for stride, pad, dil, groups in [(1, 2, 1, 1), (2, 1, 1, 1), (1, 4, 3, 1), (1, 1, 1, 2)]:
        tconv = torch.nn.Conv1d(6, 8, 5, stride=stride, padding=pad, dilation=dil, groups=groups)
        p = {
            "weight": jnp.asarray(tconv.weight.detach().numpy()),
            "bias": jnp.asarray(tconv.bias.detach().numpy()),
        }
        got = P.conv1d(p, jnp.asarray(x), stride=stride, padding=pad, dilation=dil, groups=groups)
        want = tconv(torch.from_numpy(x)).detach().numpy()
        np.testing.assert_allclose(np.asarray(got), want, atol=1e-5, rtol=1e-4)


def test_conv_transpose1d_matches_torch():
    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, 6, 25)).astype(np.float32)
    for stride, k, pad in [(8, 16, 4), (5, 11, 3), (3, 7, 2)]:
        tconv = torch.nn.ConvTranspose1d(6, 4, k, stride=stride, padding=pad)
        p = {
            "weight": jnp.asarray(tconv.weight.detach().numpy()),
            "bias": jnp.asarray(tconv.bias.detach().numpy()),
        }
        got = P.conv_transpose1d(p, jnp.asarray(x), stride=stride, padding=pad)
        want = tconv(torch.from_numpy(x)).detach().numpy()
        assert got.shape == want.shape
        np.testing.assert_allclose(np.asarray(got), want, atol=1e-5, rtol=1e-4)


def test_group_norm_matches_torch():
    rng = np.random.default_rng(2)
    x = rng.standard_normal((2, 8, 13)).astype(np.float32)
    tnorm = torch.nn.GroupNorm(4, 8)
    with torch.no_grad():
        tnorm.weight.uniform_(0.5, 1.5)
        tnorm.bias.uniform_(-0.5, 0.5)
    p = {
        "weight": jnp.asarray(tnorm.weight.detach().numpy()),
        "bias": jnp.asarray(tnorm.bias.detach().numpy()),
    }
    got = P.group_norm(p, jnp.asarray(x), groups=4)
    want = tnorm(torch.from_numpy(x)).detach().numpy()
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-5, rtol=1e-4)


def test_fold_weight_norm():
    conv = torch.nn.utils.parametrizations.weight_norm(torch.nn.Conv1d(4, 8, 3))
    g = conv.parametrizations.weight.original0.detach().numpy()
    v = conv.parametrizations.weight.original1.detach().numpy()
    folded = P.fold_weight_norm(g, v)
    np.testing.assert_allclose(folded, conv.weight.detach().numpy(), atol=1e-6)


def test_snake_matches_reference_formula():
    rng = np.random.default_rng(3)
    x = rng.standard_normal((1, 4, 9)).astype(np.float32)
    alpha = np.abs(rng.standard_normal(4)).astype(np.float32) + 0.5
    got = P.snake(jnp.asarray(x), jnp.asarray(alpha))
    a = alpha[None, :, None]
    want = x + np.sin(a * x) ** 2 / (a + 1e-9)
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-6)


def test_rms_norm_matches_torch():
    rng = np.random.default_rng(4)
    x = rng.standard_normal((2, 5, 16)).astype(np.float32)
    w = rng.standard_normal(16).astype(np.float32)
    got = P.rms_norm({"weight": jnp.asarray(w)}, jnp.asarray(x), eps=1e-6)
    xt = torch.from_numpy(x)
    want = xt * torch.rsqrt(xt.pow(2).mean(-1, keepdim=True) + 1e-6) * torch.from_numpy(w)
    np.testing.assert_allclose(np.asarray(got), want.numpy(), atol=1e-5, rtol=1e-4)


def test_int8_dense_quantization():
    rng = np.random.default_rng(7)
    w = rng.standard_normal((64, 96)).astype(np.float32)
    b = rng.standard_normal(64).astype(np.float32)
    x = rng.standard_normal((4, 96)).astype(np.float32)
    p = {"weight": jnp.asarray(w), "bias": jnp.asarray(b)}
    pq = P.quantize_dense(p)
    assert pq["weight_q"].dtype == jnp.int8
    y = np.asarray(P.dense(p, jnp.asarray(x)))
    yq = np.asarray(P.dense(pq, jnp.asarray(x)))
    cos = np.sum(y * yq) / (np.linalg.norm(y) * np.linalg.norm(yq))
    assert cos > 0.999
    rel = np.linalg.norm(y - yq) / np.linalg.norm(y)
    assert rel < 0.02
