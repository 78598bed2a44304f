"""The spectrogram-mask network (VoiceFilter / VoiceSplit).

One flax module covers both reference models, which differ only in the
conv-stack activation (reference `models/voicefilter/model.py:11-90` uses
ReLU; `models/voicesplit/model.py:9-89` uses Mish — the files are
otherwise identical):

    spec [B, T, F] ──unsqueeze──► [B, T, F, 1]  (NHWC; time is H, freq is W)
      conv1 1×7, conv2 7×1, then 5×5 with time-dilation 1/2/4/8/16,
      64 ch, BatchNorm + act each, "same" zero padding
      (reference `:17-54`)
    1×1 conv → 8 ch → reshape [B, T, 8F]        (reference `:73-75`)
    concat d-vector per frame → [B, T, 8F+256]  (reference `:77-82`)
    BiLSTM(→400×2) → ReLU → fc1(600) → ReLU → fc2(601) → sigmoid
                                                 (reference `:58-65, 83-88`)

TPU-first choices: NHWC layout (XLA TPU's native conv layout), bf16
compute / fp32 params + batch-norm stats, `lax.scan` BiLSTM with hoisted
input projection, everything static-shaped for one-time compilation.

The network is split into `conv_features` and `mask_head` methods so the
streaming engine can run the (stateless, non-causal, receptive field
±32 frames) conv stack on overlapping context windows while threading
the unidirectional-LSTM carry only over emitted frames.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from voicesplit_tpu.config import Config
from voicesplit_tpu.models.lstm import BiLSTM, UniLSTM


def mish(x: jnp.ndarray) -> jnp.ndarray:
    """x * tanh(softplus(x)) (reference `utils/generic_utils.py:376-399`)."""
    return x * jnp.tanh(jax.nn.softplus(x))


_ACTIVATIONS = {"relu": nn.relu, "mish": mish}

# Half of the conv stack's time receptive field (65 frames, reference
# `models/voicefilter/model.py:17-54`): context needed on each side for
# exact streaming.  The stack's one-sided time receptive field is the sum
# of the layers' one-sided extents: (7x1) ±3, then 5-tap time convs with
# dilations 1,2,4,8,16 contributing ±2d each — 3+2+4+8+16+32 = 65
# (verified against a full-sequence pass in
# `tests/test_streaming.py::test_windowed_conv_features_match_full_pass`).
BASE_CONV_CONTEXT = 65


def remat_convs_enabled() -> bool:
    """Opt-in (VOICESPLIT_REMAT_CONV=1): rematerialize each conv block in
    backward instead of saving its activations.

    Measured SLOWER at fitting batch sizes (B=16: 106 → 119.8 ms for the
    heavy chain — recomputing the BN stats reduces costs more HBM traffic
    than the saved residuals, docs/KERNELS.md), so it is OFF by default;
    its purpose is fitting LARGER batches (the B=64 compile-time OOM) to
    probe whether batch scaling buys back the recompute."""
    import os

    return os.environ.get("VOICESPLIT_REMAT_CONV", "0") == "1"


def tapsum_conv_enabled() -> bool:
    """Opt-in (VOICESPLIT_TAPSUM_CONV=1) alternative conv path.

    Measured on v5e (B=16): the XLA-materialized freq-im2col concat makes
    this 2.5x SLOWER than XLA's native conv emitters (517 vs 210 ms/step)
    — the concat streams 5x the activation bytes through HBM.  Kept as a
    tested, numerically-identical formulation (the basis of the Pallas
    conv kernel, which builds the same K=320 operand in VMEM instead)."""
    import os

    return os.environ.get("VOICESPLIT_TAPSUM_CONV", "0") == "1"


class _FoldedConv(nn.Module):
    """Conv in folded frequency layout (`ops/conv_fold.py`), with the same
    param names/shapes as `nn.Conv` so checkpoints and sharding rules are
    interchangeable with every other conv path.  Params are declared in
    ``setup`` so the parent can read them directly (the fused Pallas
    chain, `ops/conv_fused.py`, consumes whole-stack weights).

    ``causal`` pads the time axis ``(2e, 0)`` instead of ``(e, e)`` —
    identical tap formula ``out[t] = Σ_k w[k]·x[t − 2e + k·d]`` to a
    right-shifted input through a symmetric conv, but with no array-end
    truncation and no buffer frames in the BatchNorm statistics."""

    features: int
    in_features: int
    kernel_size: Tuple[int, int]
    kernel_dilation: Tuple[int, int]
    dtype: jnp.dtype
    param_dtype: jnp.dtype
    causal: bool = False

    def setup(self):
        kt, kf = self.kernel_size
        self.kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (kt, kf, self.in_features, self.features),
            self.param_dtype,
        )
        self.bias = self.param(
            "bias", nn.initializers.zeros_init(), (self.features,), self.param_dtype
        )

    def __call__(self, xf: jnp.ndarray) -> jnp.ndarray:
        from voicesplit_tpu.ops.conv_fold import conv2d_folded

        time_padding = None
        if self.causal:
            e = (self.kernel_size[0] - 1) * self.kernel_dilation[0] // 2
            time_padding = (2 * e, 0)
        return conv2d_folded(
            xf.astype(self.dtype),
            self.kernel.astype(self.dtype),
            self.bias.astype(self.dtype),
            self.kernel_dilation,
            time_padding=time_padding,
        )


class _FoldedBatchNorm(nn.Module):
    """`nn.BatchNorm`-equivalent statistics + the block activation, fused
    (same variable names: params scale/bias, batch_stats mean/var, all
    canonical [C]); exact because the zero pad column is excluded via the
    real element count.  Train mode goes through the custom-VJP
    `ops/bn_act.py` op whose backward is two fused HBM passes instead of
    autodiff's saved-transcendental chain (the conv stack's dominant
    non-MXU cost — see that module's docstring for measurements)."""

    num_freq: int
    act: str
    features: int = 64
    momentum: float = 0.9
    epsilon: float = 1e-5

    def setup(self):
        C = self.features
        self.scale = self.param("scale", nn.initializers.ones_init(), (C,), jnp.float32)
        self.bias = self.param("bias", nn.initializers.zeros_init(), (C,), jnp.float32)
        self.ra_mean = self.variable("batch_stats", "mean",
                                     lambda: jnp.zeros((C,), jnp.float32))
        self.ra_var = self.variable("batch_stats", "var",
                                    lambda: jnp.ones((C,), jnp.float32))

    def update_running(self, mean: jnp.ndarray, var: jnp.ndarray):
        """Momentum update of the running statistics (train steps only)."""
        if not self.is_initializing():
            m = self.momentum
            mean = jax.lax.stop_gradient(mean)
            var = jax.lax.stop_gradient(var)
            self.ra_mean.value = m * self.ra_mean.value + (1.0 - m) * mean
            self.ra_var.value = m * self.ra_var.value + (1.0 - m) * var

    def __call__(self, xf: jnp.ndarray, use_running_average: bool) -> jnp.ndarray:
        from voicesplit_tpu.ops.bn_act import folded_bn_act_eval, folded_bn_act_train

        if use_running_average:
            return folded_bn_act_eval(
                xf, self.scale, self.bias, self.ra_mean.value, self.ra_var.value,
                self.num_freq, self.act, self.epsilon,
            )
        y, mean, var = folded_bn_act_train(
            xf, self.scale, self.bias, self.num_freq, self.act, self.epsilon
        )
        self.update_running(mean, var)
        return y


class _CustomConv(nn.Module):
    """Param-compatible stand-in for `nn.Conv` (same kernel/bias names &
    shapes) that computes the conv via a custom op:

    - ``impl="pallas"`` → `ops.conv_pallas.conv_dispatch` (fused Pallas
      kernel for the heavy layers on TPU, XLA conv elsewhere);
    - ``impl="tapsum"`` → `ops.conv_tapsum.conv2d_tapsum` (XLA-level
      tap-sum formulation, opt-in)."""

    features: int
    kernel_size: Tuple[int, int]
    kernel_dilation: Tuple[int, int]
    dtype: jnp.dtype
    param_dtype: jnp.dtype
    impl: str = "pallas"

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        kt, kf = self.kernel_size
        cin = x.shape[-1]
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (kt, kf, cin, self.features),
            self.param_dtype,
        )
        bias = self.param("bias", nn.initializers.zeros_init(), (self.features,), self.param_dtype)
        x = x.astype(self.dtype)
        if self.impl == "tapsum":
            from voicesplit_tpu.ops.conv_tapsum import conv2d_tapsum

            return conv2d_tapsum(x, kernel, bias, self.kernel_dilation)
        from voicesplit_tpu.ops.conv_pallas import conv_dispatch

        return conv_dispatch(x, kernel, bias, self.kernel_dilation)


class ConvBlock(nn.Module):
    """ZeroPad → Conv2D → BatchNorm → activation (one reference conv layer).

    Submodules are declared in ``setup`` (names Conv_0 / BatchNorm_0 as
    before, so checkpoints are unchanged) which lets `MaskNet` reach the
    raw conv/BN params when driving the fused Pallas chain."""

    features: int
    in_features: int
    kernel: Tuple[int, int]  # (time, freq)
    dilation: Tuple[int, int] = (1, 1)
    activation: str = "relu"
    param_dtype: jnp.dtype = jnp.float32
    compute_dtype: jnp.dtype = jnp.float32
    folded: bool = False  # input/output in folded frequency layout
    num_freq: int = 0  # real F (folded layout bookkeeping)
    causal: bool = False  # (2e, 0) time padding instead of (e, e)

    def setup(self):
        from voicesplit_tpu.ops.conv_pallas import pallas_conv_available

        if self.folded:
            self.conv = _FoldedConv(
                self.features, self.in_features, self.kernel, self.dilation,
                self.compute_dtype, self.param_dtype, causal=self.causal,
                name="Conv_0",
            )
            self.bn = _FoldedBatchNorm(
                self.num_freq, self.activation, self.features, name="BatchNorm_0"
            )
        elif not self.causal and (tapsum_conv_enabled() or pallas_conv_available()):
            # the opt-in experimental conv paths are symmetric-only;
            # causal mode falls through to nn.Conv below
            impl = "tapsum" if tapsum_conv_enabled() else "pallas"
            self.conv = _CustomConv(
                self.features, self.kernel, self.dilation,
                self.compute_dtype, self.param_dtype,
                impl=impl, name="Conv_0",
            )
            self.bn = nn.BatchNorm(
                momentum=0.9, epsilon=1e-5, dtype=self.compute_dtype,
                param_dtype=jnp.float32, name="BatchNorm_0",
            )
        else:
            kt, kf = self.kernel
            dt, df = self.dilation
            pad_t = (kt - 1) * dt // 2  # reference's explicit ZeroPad2d sizes
            pad_f = (kf - 1) * df // 2
            time_pad = (2 * pad_t, 0) if self.causal else (pad_t, pad_t)
            self.conv = nn.Conv(
                self.features,
                kernel_size=self.kernel,
                kernel_dilation=self.dilation,
                padding=(time_pad, (pad_f, pad_f)),
                use_bias=True,
                dtype=self.compute_dtype,
                param_dtype=self.param_dtype,
                name="Conv_0",
            )
            self.bn = nn.BatchNorm(
                momentum=0.9, epsilon=1e-5, dtype=self.compute_dtype,
                param_dtype=jnp.float32, name="BatchNorm_0",
            )

    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        if self.folded:
            # fused BN+act zeroes the pad column on read (conv garbage
            # must not pollute statistics) and emits it zero for the
            # next layer's conv reads
            return self.bn(self.conv(x), use_running_average=not train)
        x = self.conv(x)
        x = self.bn(x, use_running_average=not train)
        return _ACTIVATIONS[self.activation](x)


class MaskNet(nn.Module):
    """Speaker-conditioned soft-mask network.

    `activation="relu"` ⇒ VoiceFilter, `"mish"` ⇒ VoiceSplit.
    `num_extra_dilated_blocks` deepens the dilated stack (wide variant,
    BASELINE config 4); extra blocks continue the dilation doubling.
    `streaming=True` swaps the BiLSTM for a unidirectional LSTM whose
    carry is threaded through `__call__` / `mask_head` (BASELINE config 5).
    """

    num_freq: int = 601
    emb_dim: int = 256
    lstm_dim: int = 400
    fc1_dim: int = 600
    fc2_dim: int = 601
    conv_channels: int = 64
    conv_out_channels: int = 8
    activation: str = "relu"
    num_extra_dilated_blocks: int = 0
    streaming: bool = False
    causal: bool = False  # left-only conv context (zero-lookahead streaming)
    dropout: float = 0.0  # train-time dropout (LSTM input + output); the
    # reference has none — this is the tiny-corpus overfit lever
    param_dtype: jnp.dtype = jnp.float32
    compute_dtype: jnp.dtype = jnp.float32

    def _use_folded_convs(self) -> bool:
        """Folded frequency layout is the default conv path (2.3x fwd+bwd
        on v5e vs XLA's 64-channel convs, `ops/conv_fold.py`); the
        opt-in tapsum/Pallas experiments take precedence when set —
        except in causal mode, where those symmetric-only paths are
        skipped."""
        from voicesplit_tpu.ops.conv_fold import folded_conv_enabled
        from voicesplit_tpu.ops.conv_pallas import pallas_conv_available

        if self.causal:
            return folded_conv_enabled()
        return (
            folded_conv_enabled()
            and not tapsum_conv_enabled()
            and not pallas_conv_available()
        )

    def setup(self):
        folded = self._use_folded_convs()
        specs: List[Tuple[Tuple[int, int], Tuple[int, int]]] = [
            ((1, 7), (1, 1)),  # cnn1 (reference `:19-21`)
            ((7, 1), (1, 1)),  # cnn2
            ((5, 5), (1, 1)),  # cnn3
            ((5, 5), (2, 1)),  # cnn4 — receptive field (9, 5)
            ((5, 5), (4, 1)),  # cnn5 — (17, 5)
            ((5, 5), (8, 1)),  # cnn6 — (33, 5)
            ((5, 5), (16, 1)),  # cnn7 — (65, 5)
        ]
        for i in range(self.num_extra_dilated_blocks):
            specs.append(((5, 5), (32 * 2**i, 1)))  # wide-variant extension
        conv_cls = ConvBlock
        if remat_convs_enabled():
            # train is static (python bool); self is arg 0
            conv_cls = nn.remat(ConvBlock, static_argnums=(2,))
        blocks = [
            conv_cls(
                self.conv_channels, 1 if i == 0 else self.conv_channels,
                k, d, self.activation,
                self.param_dtype, self.compute_dtype,
                folded=folded, num_freq=self.num_freq, causal=self.causal,
                name=f"conv{i + 1}",
            )
            for i, (k, d) in enumerate(specs)
        ]
        blocks.append(
            conv_cls(
                self.conv_out_channels, self.conv_channels, (1, 1), (1, 1),
                self.activation,
                self.param_dtype, self.compute_dtype,
                folded=folded, num_freq=self.num_freq, causal=self.causal,
                name=f"conv{len(specs) + 1}",
            )
        )
        # fused-chain layers (c2=2C): ((kt, kf), time_dilation)
        self._chain_specs = tuple((k, d[0]) for k, d in specs[1:])
        self.conv_blocks = blocks
        if self.streaming:
            self.lstm = UniLSTM(self.lstm_dim, self.param_dtype, self.compute_dtype, name="lstm")
        else:
            self.lstm = BiLSTM(self.lstm_dim, self.param_dtype, self.compute_dtype, name="lstm")
        self.fc1 = nn.Dense(self.fc1_dim, dtype=self.compute_dtype,
                            param_dtype=self.param_dtype, name="fc1")
        self.fc2 = nn.Dense(self.fc2_dim, dtype=self.compute_dtype,
                            param_dtype=self.param_dtype, name="fc2")
        # parameter-free; rate 0 (the default) never requests an rng, so
        # existing callers/checkpoints see identical behavior
        self.drop = nn.Dropout(rate=self.dropout)

    def _use_fused_chain(self, train: bool) -> bool:
        """Fused Pallas conv chain (`ops/conv_fused.py`): train-mode,
        non-causal, folded layout with MXU-native 2C=128k channels."""
        from voicesplit_tpu.ops.conv_fused import fused_chain_enabled

        return (
            train
            and not self.causal
            and fused_chain_enabled()
            and (2 * self.conv_channels) % 128 == 0
        )

    def _fused_chain_features(self, xf: jnp.ndarray, T: int) -> jnp.ndarray:
        """Heavy conv stack as ONE fused Pallas chain.

        Layer map: block[0] (the (1,7) 1-channel layer) runs as usual and
        produces the chain input y1; the chain computes block[1..n-2]'s
        convs with every internal BN+act fused into kernel prologues and
        each layer's batch statistics fused into its epilogue; block
        [n-2]'s BN+act is applied by its own `_FoldedBatchNorm` (reusing
        the default custom-VJP op); block[n-1] (the 1x1 projection) runs
        as usual."""
        from voicesplit_tpu.ops.conv_fused import make_chain

        y1 = self.conv_blocks[0](xf, True)
        chain_blocks = self.conv_blocks[1:-1]
        chain = make_chain(self._chain_specs, T, self.num_freq, self.activation)
        weights = tuple(b.conv.kernel for b in chain_blocks)
        cbiases = tuple(b.conv.bias for b in chain_blocks)
        scales = tuple(b.bn.scale for b in chain_blocks[:-1])
        bbiases = tuple(b.bn.bias for b in chain_blocks[:-1])
        raw, means, vars_ = chain(y1, weights, cbiases, scales, bbiases)
        # running-statistic updates for the chain-internal BNs (the
        # final block's update happens inside its own bn call below)
        for b, m, v in zip(chain_blocks[:-1], means[:-1], vars_[:-1]):
            b.bn.update_running(m, v)
        hf = chain_blocks[-1].bn(raw, use_running_average=False)
        return self.conv_blocks[-1](hf, True)

    @property
    def conv_context(self) -> int:
        """Frames of one-sided conv context (grows with extra blocks)."""
        extra = sum(2 * 32 * 2**i for i in range(self.num_extra_dilated_blocks))
        return BASE_CONV_CONTEXT + extra

    @property
    def conv_context_left(self) -> int:
        """Past frames each output frame depends on.  Causal mode folds
        the whole receptive field into the past (2x the symmetric
        one-sided context)."""
        return 2 * self.conv_context if self.causal else self.conv_context

    @property
    def conv_context_right(self) -> int:
        """Future frames each output frame depends on (the streaming
        lookahead); zero in causal mode."""
        return 0 if self.causal else self.conv_context

    def conv_features(
        self,
        spec: jnp.ndarray,
        train: bool = False,
        edge_mask: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        """``[B, T, F]`` → flattened conv features ``[B, T, 8F]``.

        In causal mode every block pads the time axis ``(2e, 0)`` instead
        of ``(e, e)`` — the identical tap formula to a right-shifted
        input through a symmetric conv, so output frame t reads input
        frames [t-2e, t] only, layer by layer, and the whole stack needs
        zero lookahead (`conv_context_right == 0`) with no array-end
        truncation (`tests/test_streaming.py::
        test_causal_tail_frames_see_recent_input`).

        `edge_mask` (``[B or 1, T]`` 0/1): frames marked 0 are forced to
        zero at the input AND after every block, which makes them behave
        exactly like the zero PADDING of a pass over the valid frames
        alone (a frame marked 0 contributes zeros to its neighbours'
        convolutions at every layer, not conv-of-zero-input activations).
        Used by the sequence-parallel engine (`parallel/sequence.py`) for
        shard-alignment padding and out-of-sequence halos."""
        mask = None
        if edge_mask is not None:
            mask = edge_mask.astype(self.compute_dtype)[:, :, None, None]

        def apply_mask(h):
            return h if mask is None else h * mask

        B, T, F = spec.shape
        x = spec.astype(self.compute_dtype)[..., None]  # NHWC
        if self.conv_blocks[0].folded:
            from voicesplit_tpu.ops.conv_fold import fold_input, unfold_output

            # fold ONCE for the whole stack (pad + free bitcast reshape);
            # folding keeps time on axis 1, so the mask broadcasts as-is
            xf = fold_input(apply_mask(x))
            if self._use_fused_chain(train):
                if edge_mask is not None:
                    raise NotImplementedError(
                        "edge_mask is not supported by the fused conv chain"
                    )
                xf = self._fused_chain_features(xf, T)
            else:
                for block in self.conv_blocks:
                    xf = apply_mask(block(xf, train))
            x = unfold_output(xf, F)
        else:
            x = apply_mask(x)
            for block in self.conv_blocks:
                x = apply_mask(block(x, train))
        # [B, T, F, 8] → [B, T, 8F].  The reference flattens channel-major
        # ([B,C,T,F].transpose(1,2).view → index c*F+f, `:73-75`); we
        # flatten frequency-major (f*C+c), which is FREE from NHWC, while
        # the channel-major order costs a [601, 8]-minor-dim relayout that
        # measures ~29 ms fwd+bwd at B=16 on v5e.  The two layouts differ
        # by a fixed permutation of the flattened axis, which the next op
        # — the learned BiLSTM input projection — absorbs into its weight
        # ROW order: the model class and its init distribution are
        # permutation-invariant, so training dynamics are identical.
        # (Anything importing reference-trained W_ih rows must permute
        # rows by f*C+c ↔ c*F+f.)
        return x.reshape(B, T, self.conv_out_channels * F)

    def mask_head(
        self,
        features: jnp.ndarray,  # [B, T, 8F]
        emb: jnp.ndarray,  # [B, emb_dim]
        train: bool = False,
        lstm_carry: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,
    ):
        B, T, _ = features.shape
        cd = self.compute_dtype
        emb_t = jnp.broadcast_to(emb.astype(cd)[:, None, :], (B, T, self.emb_dim))
        x = jnp.concatenate([features, emb_t], axis=-1)  # [B, T, 8F + emb]
        x = self.drop(x, deterministic=not train)
        if self.streaming:
            x, carry = self.lstm(x, lstm_carry)
        else:
            x = self.lstm(x)
            carry = None
        x = nn.relu(x)  # post-LSTM ReLU kept in both reference models (`:84`)
        x = self.drop(x, deterministic=not train)
        x = nn.relu(self.fc1(x))
        mask = jax.nn.sigmoid(self.fc2(x).astype(jnp.float32))  # fp32 [B, T, F]
        if self.streaming:
            return mask, carry
        return mask

    def __call__(
        self,
        spec: jnp.ndarray,
        emb: jnp.ndarray,
        train: bool = False,
        lstm_carry: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,
    ):
        features = self.conv_features(spec, train)
        return self.mask_head(features, emb, train, lstm_carry)


def make_masknet(config: Config, streaming: bool = False) -> MaskNet:
    """Build the model selected by ``config.model_name``

    ("voicefilter" ⇒ relu, "voicesplit" ⇒ mish — reference `train.py:26-31`).
    """
    act = "relu" if config.model_name == "voicefilter" else "mish"
    dtype = jnp.dtype(config.train_config.compute_dtype)
    m = config.model
    return MaskNet(
        num_freq=config.audio.active.num_freq,
        emb_dim=m.emb_dim,
        lstm_dim=m.lstm_dim,
        fc1_dim=m.fc1_dim,
        fc2_dim=m.fc2_dim,
        conv_channels=m.conv_channels,
        conv_out_channels=m.conv_out_channels,
        activation=act,
        num_extra_dilated_blocks=m.num_extra_dilated_blocks,
        streaming=streaming,
        causal=m.causal,
        dropout=m.dropout,
        compute_dtype=dtype,
    )
