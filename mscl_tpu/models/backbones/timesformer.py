"""TimeSformer — divided space-time attention video transformer.

Parity: reference mmaction/models/backbones/timesformer.py — ViT patch
embedding over frames + per-block temporal attention then spatial
attention (attention_type 'divided_space_time'; 'space_only' and
'joint_space_time' variants supported). Attention runs as batched MXU
matmuls (jax.nn.dot_product_attention-style einsums).
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..builder import BACKBONES


class MHSA(nn.Module):
    dim: int
    num_heads: int = 12
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, n, c = x.shape
        h = self.num_heads
        qkv = nn.Dense(3 * self.dim, dtype=self.dtype, name='qkv')(x)
        q, k, v = jnp.split(qkv.reshape(b, n, 3, h, c // h), 3, axis=2)
        q, k, v = [t.squeeze(2).transpose(0, 2, 1, 3) for t in (q, k, v)]
        attn = jnp.einsum('bhqd,bhkd->bhqk', q, k,
                          preferred_element_type=jnp.float32)
        attn = jax.nn.softmax(attn / jnp.sqrt(c // h), axis=-1)
        attn = attn.astype(v.dtype)
        out = jnp.einsum('bhqk,bhkd->bhqd', attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, n, c)
        return nn.Dense(self.dim, dtype=self.dtype, name='proj')(out)


class Mlp(nn.Module):
    dim: int
    mlp_ratio: float = 4.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(int(self.dim * self.mlp_ratio), dtype=self.dtype,
                     name='fc1')(x)
        # exact erf GELU (torch nn.GELU default; flax's
        # default is the tanh approximation)
        x = nn.gelu(x, approximate=False)
        return nn.Dense(self.dim, dtype=self.dtype, name='fc2')(x)


class DividedBlock(nn.Module):
    dim: int
    num_heads: int
    num_frames: int
    attention_type: str = 'divided_space_time'
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        # x: (B, 1 + T*P, C) with cls token first
        b, n, c = x.shape
        t = self.num_frames
        p = (n - 1) // t

        if self.attention_type == 'divided_space_time':
            # temporal attention over same-patch tokens across time
            xt = x[:, 1:].reshape(b, t, p, c).transpose(0, 2, 1, 3)
            xt = xt.reshape(b * p, t, c)
            res_t = MHSA(self.dim, self.num_heads, dtype=self.dtype,
                         name='temporal_attn')(
                nn.LayerNorm(dtype=self.dtype, name='norm_t')(xt), train)
            res_t = nn.Dense(self.dim, dtype=self.dtype,
                             name='temporal_fc')(res_t)
            xt = xt + res_t
            xt = xt.reshape(b, p, t, c).transpose(0, 2, 1, 3)
            x = jnp.concatenate([x[:, :1], xt.reshape(b, t * p, c)],
                                axis=1)

            # spatial attention per frame with broadcast cls token
            cls = x[:, :1]
            xs = x[:, 1:].reshape(b, t, p, c).reshape(b * t, p, c)
            cls_rep = jnp.repeat(cls, t, axis=0)
            xs = jnp.concatenate([cls_rep, xs], axis=1)
            res_s = MHSA(self.dim, self.num_heads, dtype=self.dtype,
                         name='spatial_attn')(
                nn.LayerNorm(dtype=self.dtype, name='norm_s')(xs), train)
            cls_out = res_s[:, 0].reshape(b, t, c).mean(axis=1,
                                                        keepdims=True)
            patch_out = res_s[:, 1:].reshape(b, t * p, c)
            x = x + jnp.concatenate([cls_out, patch_out], axis=1)
        else:
            # joint space-time / space-only: one attention over all tokens
            res = MHSA(self.dim, self.num_heads, dtype=self.dtype,
                       name='attn')(
                nn.LayerNorm(dtype=self.dtype, name='norm1')(x), train)
            x = x + res
        x = x + Mlp(self.dim, dtype=self.dtype, name='mlp')(
            nn.LayerNorm(dtype=self.dtype, name='norm2')(x))
        return x


@BACKBONES.register_module()
class TimeSformer(nn.Module):
    num_frames: int = 8
    img_size: int = 224
    patch_size: int = 16
    pretrained: Any = None
    embed_dims: int = 768
    num_heads: int = 12
    num_transformer_layers: int = 12
    attention_type: str = 'divided_space_time'
    dropout_ratio: float = 0.0
    # accepted reference cfg surface (timesformer config keys)
    in_channels: int = 3
    transformer_layers: Any = None    # None = the default stack
    norm_cfg: Any = None              # LN semantics fixed
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        """x: (N, T, H, W, C) clip -> (N, embed_dims) cls feature."""
        b, t, h, w, _ = x.shape
        ps = self.patch_size
        x = x.reshape(b * t, h, w, x.shape[-1])
        x = nn.Conv(self.embed_dims, (ps, ps), strides=(ps, ps),
                    dtype=self.dtype, name='patch_embed')(x)
        p = x.shape[1] * x.shape[2]
        x = x.reshape(b * t, p, self.embed_dims)

        pos = self.param('pos_embed', nn.initializers.normal(0.02),
                         (1, p + 1, self.embed_dims))
        cls_tok = self.param('cls_token', nn.initializers.zeros,
                             (1, 1, self.embed_dims))
        cls = jnp.broadcast_to(cls_tok, (b * t, 1, self.embed_dims))
        # cast back after the f32-param add: otherwise the f32 embedding
        # params promote the ENTIRE residual stream (every block's
        # transposes/adds) to f32
        x = (jnp.concatenate([cls, x], axis=1) + pos).astype(self.dtype)

        if self.attention_type != 'space_only':
            time_embed = self.param('time_embed',
                                    nn.initializers.normal(0.02),
                                    (1, t, self.embed_dims))
            patches = x[:, 1:].reshape(b, t, p, self.embed_dims)
            patches = (patches + time_embed[:, :, None]).astype(self.dtype)
            cls = x[:, :1].reshape(b, t, 1, self.embed_dims)[:, 0]
            x = jnp.concatenate(
                [cls, patches.reshape(b, t * p, self.embed_dims)], axis=1)
        else:
            # keep frames in batch; attention is purely spatial
            pass

        for i in range(self.num_transformer_layers):
            if self.attention_type == 'space_only':
                x = DividedBlock(self.embed_dims, self.num_heads, 1,
                                 'space_only', dtype=self.dtype,
                                 name=f'block_{i}')(x, train)
            else:
                x = DividedBlock(self.embed_dims, self.num_heads, t,
                                 self.attention_type, dtype=self.dtype,
                                 name=f'block_{i}')(x, train)
        x = nn.LayerNorm(dtype=self.dtype, name='norm')(x)
        if self.attention_type == 'space_only':
            return x[:, 0].reshape(b, t, self.embed_dims).mean(axis=1)
        return x[:, 0]
