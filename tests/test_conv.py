"""Causal conv primitives: parity with torch semantics + streaming == batch.

The streaming contract is the reference's SConv1d/SConvTranspose1d invariant
(reference: modular_vibevoice_tokenizer.py:327-418, 478-549): chunked streaming
output equals the batch forward for stride-aligned chunks.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vibevoice_tpu.ops.conv import (
    causal_conv1d,
    causal_conv1d_step,
    causal_conv_transpose1d,
    causal_conv_transpose1d_step,
    context_size,
)


@pytest.mark.parametrize("kernel,stride,groups", [(7, 1, 1), (4, 2, 1), (10, 5, 1), (7, 1, 8)])
def test_causal_conv_matches_torch(kernel, stride, groups):
    torch = pytest.importorskip("torch")
    rs = np.random.RandomState(0)
    b, t, cin, cout = 2, 40, 8, 8
    x = rs.randn(b, t, cin).astype(np.float32)
    w = rs.randn(kernel, cin // groups, cout).astype(np.float32) * 0.1
    bias = rs.randn(cout).astype(np.float32)

    y = causal_conv1d(jnp.asarray(x), jnp.asarray(w), jnp.asarray(bias),
                      stride=stride, groups=groups)

    # torch: left-pad (k-1)-(s-1) zeros then conv1d
    pad = (kernel - 1) - (stride - 1)
    xt = torch.tensor(x).permute(0, 2, 1)
    xt = torch.nn.functional.pad(xt, (pad, 0))
    wt = torch.tensor(w).permute(2, 1, 0)  # [out, in/groups, k]
    yt = torch.nn.functional.conv1d(xt, wt, torch.tensor(bias), stride=stride,
                                    groups=groups)
    yt = yt.permute(0, 2, 1).numpy()
    np.testing.assert_allclose(np.asarray(y), yt, rtol=1e-4, atol=1e-4)
    assert y.shape[1] == -(-t // stride)


@pytest.mark.parametrize("kernel,stride", [(16, 8), (10, 5), (4, 2)])
def test_causal_conv_transpose_matches_torch(kernel, stride):
    torch = pytest.importorskip("torch")
    rs = np.random.RandomState(1)
    b, t, cin, cout = 2, 6, 4, 3
    x = rs.randn(b, t, cin).astype(np.float32)
    w_torch = rs.randn(cin, cout, kernel).astype(np.float32) * 0.1  # torch layout
    bias = rs.randn(cout).astype(np.float32)

    # ours: [k, C_out, C_in]
    w = jnp.asarray(w_torch.transpose(2, 1, 0))
    y = causal_conv_transpose1d(jnp.asarray(x), w, jnp.asarray(bias), stride)

    xt = torch.tensor(x).permute(0, 2, 1)
    yt = torch.nn.functional.conv_transpose1d(xt, torch.tensor(w_torch),
                                              torch.tensor(bias), stride=stride)
    # causal trim: remove k - s from the right (trim_right_ratio = 1)
    trim = kernel - stride
    yt = yt[:, :, :-trim] if trim > 0 else yt
    yt = yt.permute(0, 2, 1).numpy()
    assert y.shape[1] == t * stride
    np.testing.assert_allclose(np.asarray(y), yt, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("kernel,stride", [(7, 1), (4, 2), (10, 5), (16, 8)])
def test_streaming_conv_equals_batch(kernel, stride):
    rs = np.random.RandomState(2)
    b, cin, cout = 2, 4, 6
    n_chunks, chunk = 5, 2 * stride
    x = rs.randn(b, n_chunks * chunk, cin).astype(np.float32)
    w = jnp.asarray(rs.randn(kernel, cin, cout).astype(np.float32) * 0.1)
    bias = jnp.asarray(rs.randn(cout).astype(np.float32))

    y_batch = causal_conv1d(jnp.asarray(x), w, bias, stride=stride)

    state = jnp.zeros((b, context_size(kernel, stride), cin), jnp.float32)
    outs = []
    for i in range(n_chunks):
        y, state = causal_conv1d_step(jnp.asarray(x[:, i * chunk:(i + 1) * chunk]),
                                      state, w, bias, stride=stride)
        outs.append(y)
    y_stream = jnp.concatenate(outs, axis=1)
    np.testing.assert_allclose(np.asarray(y_stream), np.asarray(y_batch),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("kernel,stride", [(16, 8), (10, 5), (4, 2)])
def test_streaming_conv_transpose_equals_batch(kernel, stride):
    rs = np.random.RandomState(3)
    b, cin, cout = 2, 4, 3
    n_chunks, chunk = 6, 2
    x = rs.randn(b, n_chunks * chunk, cin).astype(np.float32)
    w = jnp.asarray(rs.randn(kernel, cout, cin).astype(np.float32) * 0.1)
    bias = jnp.asarray(rs.randn(cout).astype(np.float32))

    y_batch = causal_conv_transpose1d(jnp.asarray(x), w, bias, stride)

    state = jnp.zeros((b, kernel - 1, cin), jnp.float32)
    outs = []
    for i in range(n_chunks):
        y, state = causal_conv_transpose1d_step(
            jnp.asarray(x[:, i * chunk:(i + 1) * chunk]), state, w, bias, stride)
        outs.append(y)
    y_stream = jnp.concatenate(outs, axis=1)
    assert y_stream.shape == y_batch.shape
    np.testing.assert_allclose(np.asarray(y_stream), np.asarray(y_batch),
                               rtol=1e-4, atol=1e-4)
