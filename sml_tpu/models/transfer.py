"""The transfer meta-network Θ: per-row map (W_{t-1}[r], W_hat_t[r]) -> W_t[r].

Live architecture — ``conv_com`` (reference ``model/conv_transfer.py:18-50,
87-110``): for each embedding row build the stop-gradient interaction channel

    x_com = stop_grad( (x_t ⊙ stop_grad(x_hat)) / ||x_t|| )

stack ``[x_t, x_hat, x_com]`` into a (3, d) "image", then per side (user /
item tower, separate parameters):

    conv1: 3 -> C1 channel mix (torch Conv2d(1, C1, (3,1)))   -> (C1, d)
    gelu:  x * sigmoid(1.702 x)        (conv_transfer.py:9-10)
    conv2: C1 -> C2 1x1 mix            (Conv2d(C1, C2, (1,1))) -> (C2, d)
    gelu, flatten channel-major        -> (C2*d,)
    fc1:   C2*d -> H, gelu
    fc2:   H -> d

On TPU the channel mixes are tiny matmuls fused by XLA into the surrounding
elementwise ops; the FCs are MXU matmuls over the row batch. The flatten
order (channel-major, index ``c*d + j``) matches torch's
``view(-1, d*C2)`` of a contiguous (N, C2, 1, d) tensor
(``conv_transfer.py:43``) so weights are layout-compatible for equivalence
tests.

The reference's unused alternative transfers (``model/transfer.py:94-291``)
are provided as capability parity: ``mlp_delta`` (residual MLP on
W_hat - W_last), ``linear`` (one linear layer over concat), ``gru``
(GRUCell with x_t as hidden state), ``gated`` (sigmoid-gated mix).

Parameter init mirrors torch defaults (kaiming-uniform(a=sqrt(5)) ==
U(-1/sqrt(fan_in), 1/sqrt(fan_in)) for conv/linear weights and biases) so
training trajectories are statistically comparable.
"""

from __future__ import annotations

import math
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp

from sml_tpu.config import TransferConfig


def gelu_sig(x: jax.Array) -> jax.Array:
    """The reference's GELU approximation ``x * sigmoid(1.702 x)``."""
    return x * jax.nn.sigmoid(1.702 * x)


def _uniform(key, shape, fan_in, dtype):
    bound = 1.0 / math.sqrt(fan_in)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


# ---------------------------------------------------------------------------
# conv_com tower
# ---------------------------------------------------------------------------

class ConvTower(NamedTuple):
    conv1_w: jax.Array   # (C1, K) — K input channels (3 conv_com, 2 conv2ch)
    conv1_b: jax.Array   # (C1,)
    conv2_w: jax.Array   # (C2, C1)
    conv2_b: jax.Array   # (C2,)
    fc1_w: jax.Array     # (C2*d, H)
    fc1_b: jax.Array     # (H,)
    fc2_w: jax.Array     # (H, d)
    fc2_b: jax.Array     # (d,)


def _init_conv_tower(key, cfg: TransferConfig, dtype,
                     in_channels: int = 3) -> ConvTower:
    d, c1, c2, h = cfg.latent_dim, cfg.conv1_channels, cfg.conv2_channels, cfg.fc_hidden
    ks = jax.random.split(key, 8)
    return ConvTower(
        conv1_w=_uniform(ks[0], (c1, in_channels), in_channels, dtype),
        conv1_b=_uniform(ks[1], (c1,), in_channels, dtype),
        conv2_w=_uniform(ks[2], (c2, c1), c1, dtype),
        conv2_b=_uniform(ks[3], (c2,), c1, dtype),
        fc1_w=_uniform(ks[4], (c2 * d, h), c2 * d, dtype),
        fc1_b=_uniform(ks[5], (h,), c2 * d, dtype),
        fc2_w=_uniform(ks[6], (h, d), h, dtype),
        fc2_b=_uniform(ks[7], (d,), h, dtype),
    )


def conv_tower_apply(tw: ConvTower, stack: jax.Array) -> jax.Array:
    """Apply one tower to a stacked batch ``(N, K, d)`` -> ``(N, d)``."""
    n, _, d = stack.shape
    h1 = jnp.einsum("ck,nkj->ncj", tw.conv1_w, stack) + tw.conv1_b[None, :, None]
    h1 = gelu_sig(h1)                                        # (N, C1, d)
    h2 = jnp.einsum("ec,ncj->nej", tw.conv2_w, h1) + tw.conv2_b[None, :, None]
    h2 = gelu_sig(h2)                                        # (N, C2, d)
    flat = h2.reshape(n, -1)                                 # channel-major (N, C2*d)
    h3 = gelu_sig(flat @ tw.fc1_w + tw.fc1_b)                # (N, H)
    return h3 @ tw.fc2_w + tw.fc2_b                          # (N, d)


def build_x_com(x_t: jax.Array, x_hat: jax.Array) -> jax.Array:
    """Interaction channel (``conv_transfer.py:93-100``), fully stop-gradient.

    ``(x_t ⊙ stop_grad(x_hat)) / ||x_t||`` with the whole result detached
    (the reference sets ``requires_grad=False`` on it). Zero-norm rows are
    guarded to 0 instead of the reference's NaN (zero ``last`` rows never
    reach this in the live path because ``save_MF_weight('last')`` runs first,
    ``transfer.py:766``).
    """
    prod = x_t * jax.lax.stop_gradient(x_hat)
    norm = jnp.sqrt(jnp.sum(x_t * x_t, axis=-1, keepdims=True))
    safe = jnp.where(norm > 0, norm, 1.0)
    return jax.lax.stop_gradient(jnp.where(norm > 0, prod / safe, 0.0))


class ConvRootTower(NamedTuple):
    """Tower of the ``conv_com_root`` variant (the reference's
    ``ConvTransfer_com2`` / ``ConvTransfer_com3`` — byte-identical twins,
    ``conv_transfer.py:164-181`` vs ``:201-218``): kernel-2 conv over
    ``[x_t, x_hat]``, then the 4th-root interaction channel
    ``|x_t|^1/2 ⊙ |x_hat|^1/2`` (detached) concatenated AFTER the flatten,
    GELU applied to the concatenation (``one_transfer_com.forward``,
    ``conv_transfer.py:150-162``). The reference hardcodes a 1024-wide fc1
    (``:146-149``); here the width is ``cfg.fc_hidden`` — the CLI sets 1024
    for this kind to match."""
    conv1_w: jax.Array   # (C1, 2)
    conv1_b: jax.Array   # (C1,)
    fc1_w: jax.Array     # (C1*d + d, H)
    fc1_b: jax.Array     # (H,)
    fc2_w: jax.Array     # (H, d)
    fc2_b: jax.Array     # (d,)


def _init_conv_root(key, cfg: TransferConfig, dtype) -> ConvRootTower:
    d, c1, h = cfg.latent_dim, cfg.conv1_channels, cfg.fc_hidden
    ks = jax.random.split(key, 6)
    fan1 = c1 * d + d
    return ConvRootTower(
        conv1_w=_uniform(ks[0], (c1, 2), 2, dtype),
        conv1_b=_uniform(ks[1], (c1,), 2, dtype),
        fc1_w=_uniform(ks[2], (fan1, h), fan1, dtype),
        fc1_b=_uniform(ks[3], (h,), fan1, dtype),
        fc2_w=_uniform(ks[4], (h, d), h, dtype),
        fc2_b=_uniform(ks[5], (d,), h, dtype),
    )


def _conv_root_apply(tw: ConvRootTower, x_t: jax.Array,
                     x_hat: jax.Array) -> jax.Array:
    x_com = jax.lax.stop_gradient(
        jnp.sqrt(jnp.sqrt(x_t * x_t)) * jnp.sqrt(jnp.sqrt(x_hat * x_hat)))
    stack = jnp.stack([x_t, x_hat], axis=1)                  # (N, 2, d)
    h1 = jnp.einsum("ck,nkj->ncj", tw.conv1_w, stack) \
        + tw.conv1_b[None, :, None]                          # (N, C1, d)
    flat = h1.reshape(x_t.shape[0], -1)                      # (N, C1*d)
    cat = gelu_sig(jnp.concatenate([flat, x_com], axis=-1))
    h3 = gelu_sig(cat @ tw.fc1_w + tw.fc1_b)
    return h3 @ tw.fc2_w + tw.fc2_b


# ---------------------------------------------------------------------------
# alternative variants (capability parity with model/transfer.py:94-291)
# ---------------------------------------------------------------------------

class MlpDeltaTower(NamedTuple):
    w1: jax.Array
    b1: jax.Array
    w2: jax.Array
    b2: jax.Array


def _init_mlp_delta(key, cfg, dtype) -> MlpDeltaTower:
    d, h = cfg.latent_dim, 128
    ks = jax.random.split(key, 4)
    return MlpDeltaTower(
        w1=_uniform(ks[0], (d, h), d, dtype), b1=_uniform(ks[1], (h,), d, dtype),
        w2=_uniform(ks[2], (h, d), h, dtype), b2=_uniform(ks[3], (d,), h, dtype))


def _mlp_delta_apply(tw: MlpDeltaTower, x_t, x_hat):
    """Residual delta MLP (``transfer.py:94-107``), tanh hidden, eval-mode
    dropout (identity)."""
    delta = x_hat - x_t
    h = jnp.tanh(delta @ tw.w1 + tw.b1)
    return x_t + (h @ tw.w2 + tw.b2)


class LinearTower(NamedTuple):
    w: jax.Array          # (2d, d), no bias (transfer.py:133)


def _init_linear(key, cfg, dtype) -> LinearTower:
    d = cfg.latent_dim
    return LinearTower(w=_uniform(key, (2 * d, d), 2 * d, dtype))


def _linear_apply(tw: LinearTower, x_t, x_hat):
    return jnp.concatenate([x_t, x_hat], axis=-1) @ tw.w


class GruTower(NamedTuple):
    w_ih: jax.Array       # (2d, 3d)
    w_hh: jax.Array       # (d, 3d)
    b_ih: jax.Array       # (3d,)
    b_hh: jax.Array       # (3d,)


def _init_gru(key, cfg, dtype) -> GruTower:
    d = cfg.latent_dim
    ks = jax.random.split(key, 4)
    return GruTower(
        w_ih=_uniform(ks[0], (2 * d, 3 * d), d, dtype),
        w_hh=_uniform(ks[1], (d, 3 * d), d, dtype),
        b_ih=_uniform(ks[2], (3 * d,), d, dtype),
        b_hh=_uniform(ks[3], (3 * d,), d, dtype))


def _gru_apply(tw: GruTower, x_t, x_hat):
    """GRUCell(concat(x_t, x_hat), hidden=x_t) (``transfer.py:191-213``)."""
    d = x_t.shape[-1]
    x = jnp.concatenate([x_t, x_hat], axis=-1)
    gi = x @ tw.w_ih + tw.b_ih
    gh = x_t @ tw.w_hh + tw.b_hh
    i_r, i_z, i_n = gi[..., :d], gi[..., d:2 * d], gi[..., 2 * d:]
    h_r, h_z, h_n = gh[..., :d], gh[..., d:2 * d], gh[..., 2 * d:]
    r = jax.nn.sigmoid(i_r + h_r)
    z = jax.nn.sigmoid(i_z + h_z)
    n = jnp.tanh(i_n + r * h_n)
    return (1 - z) * n + z * x_t


class GatedTower(NamedTuple):
    w1: jax.Array
    b1: jax.Array
    w2: jax.Array
    b2: jax.Array


def _init_gated(key, cfg, dtype) -> GatedTower:
    d, h = cfg.latent_dim, 128
    ks = jax.random.split(key, 4)
    return GatedTower(
        w1=_uniform(ks[0], (2 * d, h), 2 * d, dtype),
        b1=_uniform(ks[1], (h,), 2 * d, dtype),
        w2=_uniform(ks[2], (h, 2 * d), h, dtype),
        b2=_uniform(ks[3], (2 * d,), h, dtype))


def _gated_apply(tw: GatedTower, x_t, x_hat, wide_range: bool):
    """Sigmoid-gated mix (``transfer.py:238-268``); the user tower gates with
    ``6σ-3``, the item tower with plain ``σ`` (``transfer.py:254-263``)."""
    d = x_t.shape[-1]
    x = jnp.concatenate([x_t, x_hat], axis=-1)
    h = jnp.tanh(x @ tw.w1 + tw.b1)
    alpha = jax.nn.sigmoid(h @ tw.w2 + tw.b2)
    if wide_range:
        alpha = 6.0 * alpha - 3.0
    y = alpha * x
    return y[..., :d] + y[..., d:]


# ---------------------------------------------------------------------------
# public API
# ---------------------------------------------------------------------------

class TransferParams(NamedTuple):
    user: Any
    item: Any


def init_transfer(key: jax.Array, cfg: TransferConfig,
                  dtype=jnp.float32) -> TransferParams:
    ku, ki = jax.random.split(key)
    if cfg.kind == "conv_com":
        return TransferParams(_init_conv_tower(ku, cfg, dtype),
                              _init_conv_tower(ki, cfg, dtype))
    if cfg.kind == "conv2ch":
        return TransferParams(_init_conv_tower(ku, cfg, dtype, in_channels=2),
                              _init_conv_tower(ki, cfg, dtype, in_channels=2))
    if cfg.kind == "conv_com_root":
        return TransferParams(_init_conv_root(ku, cfg, dtype),
                              _init_conv_root(ki, cfg, dtype))
    if cfg.kind == "mlp_delta":
        return TransferParams(_init_mlp_delta(ku, cfg, dtype),
                              _init_mlp_delta(ki, cfg, dtype))
    if cfg.kind == "linear":
        return TransferParams(_init_linear(ku, cfg, dtype),
                              _init_linear(ki, cfg, dtype))
    if cfg.kind == "gru":
        return TransferParams(_init_gru(ku, cfg, dtype),
                              _init_gru(ki, cfg, dtype))
    if cfg.kind == "gated":
        return TransferParams(_init_gated(ku, cfg, dtype),
                              _init_gated(ki, cfg, dtype))
    raise ValueError(f"unknown transfer kind {cfg.kind!r}")


def apply_rows(theta: TransferParams, cfg: TransferConfig, side: str,
               x_t: jax.Array, x_hat: jax.Array) -> jax.Array:
    """Transfer a batch of rows for one side ('user' | 'item').

    ``x_t`` = W_{t-1} rows, ``x_hat`` = W_hat_t rows, both (N, d).
    """
    tower = theta.user if side == "user" else theta.item
    if cfg.kind == "conv_com":
        stack = jnp.stack([x_t, x_hat, build_x_com(x_t, x_hat)], axis=1)
        return conv_tower_apply(tower, stack)
    if cfg.kind == "conv2ch":
        # the reference's kernel-2 ConvTransfer (conv_transfer.py:52-68):
        # stack [x_t, x_hat]; the USER output is length-normalized by its
        # own (detached) norm
        out = conv_tower_apply(tower, jnp.stack([x_t, x_hat], axis=1))
        if side == "user":
            norm = jnp.sqrt(jnp.sum(out * out, axis=-1, keepdims=True))
            out = out / jax.lax.stop_gradient(jnp.where(norm > 0, norm, 1.0))
        return out
    if cfg.kind == "conv_com_root":
        return _conv_root_apply(tower, x_t, x_hat)
    if cfg.kind == "mlp_delta":
        return _mlp_delta_apply(tower, x_t, x_hat)
    if cfg.kind == "linear":
        return _linear_apply(tower, x_t, x_hat)
    if cfg.kind == "gru":
        return _gru_apply(tower, x_t, x_hat)
    if cfg.kind == "gated":
        return _gated_apply(tower, x_t, x_hat, wide_range=(side == "user"))
    raise ValueError(f"unknown transfer kind {cfg.kind!r}")


def apply_tables(theta: TransferParams, cfg: TransferConfig,
                 last_user: jax.Array, hat_user: jax.Array,
                 last_item: jax.Array, hat_item: jax.Array,
                 block_rows: int = 65536, use_pallas: str = "auto"):
    """Full-table refresh W_t = Θ(W_{t-1}, W_hat_t) — the reference's
    ``updata`` (``model/transfer.py:884-902``, author comment "maybe out of
    memory!!!" at ``:895``).

    Runs blocked over rows via ``lax.map`` so the (N, C2*d) / (N, H)
    intermediates never materialize beyond one block; on TPU with
    ``conv_com`` this dispatches to the fused Pallas kernel
    (:mod:`sml_tpu.ops.transfer_kernel`) when available.
    """
    if cfg.kind == "conv_com" and use_pallas != "never":
        from sml_tpu.ops import transfer_kernel
        if use_pallas == "always" or transfer_kernel.pallas_available():
            return (
                transfer_kernel.fused_table_transfer(theta.user, last_user, hat_user),
                transfer_kernel.fused_table_transfer(theta.item, last_item, hat_item),
            )

    def blocked(side, last, hat):
        n, d = last.shape
        n_pad = -(-n // block_rows) * block_rows
        pad = ((0, n_pad - n), (0, 0))
        last_p = jnp.pad(last, pad)
        hat_p = jnp.pad(hat, pad)
        blocks_l = last_p.reshape(-1, block_rows, d)
        blocks_h = hat_p.reshape(-1, block_rows, d)
        # per-block f32 upcast: snapshots may be stored bf16
        # (SMLConfig.snapshot_dtype) — only one block's f32 copy is ever live
        out = jax.lax.map(
            lambda lh: apply_rows(theta, cfg, side,
                                  lh[0].astype(jnp.float32),
                                  lh[1].astype(jnp.float32)),
            (blocks_l, blocks_h))
        return out.reshape(n_pad, d)[:n]

    return blocked("user", last_user, hat_user), \
        blocked("item", last_item, hat_item)


def apply_tables_sharded(theta: TransferParams, cfg: TransferConfig,
                         last_user: jax.Array, hat_user: jax.Array,
                         last_item: jax.Array, hat_item: jax.Array,
                         mesh, block_rows: int = 65536,
                         use_pallas: str = "auto"):
    """:func:`apply_tables` for row-sharded tables: each shard refreshes
    its own rows under ``shard_map``, zero collectives.

    Needed because the blocked fallback's ``reshape(-1, block_rows, d)``
    produces a block count GSPMD can't keep row-sharded, so under plain
    jit it ALL-GATHERS both full tables per refresh — at 50M users that is
    tens of GB per device (OOM-killed the virtual-mesh scale run twice).
    The refresh is embarrassingly row-parallel; ``shard_map`` states that.
    On a real TPU mesh each shard still dispatches to the fused Pallas
    kernel (``use_pallas`` is passed through).
    """
    from jax.sharding import PartitionSpec as P

    def fn(th, lu, hu, li, hi):
        return apply_tables(th, cfg, lu, hu, li, hi,
                            block_rows=block_rows, use_pallas=use_pallas)

    row = P("model")
    return jax.shard_map(fn, mesh=mesh,
                         in_specs=(P(), row, row, row, row),
                         out_specs=(row, row))(
        theta, last_user, hat_user, last_item, hat_item)
