"""CLIP text encoder model (ViT-L/14, ViT-H/14, ViT-bigG/14 text towers).

reference: src/clip.c:317-488.  Parameter names follow the internal scheme
(``clip.text.encoder.layers.N.attn.q_proj.weight`` ...).  The MLP activation
is selected by d_model exactly like the reference (gelu_quick for SD1's 768,
tanh-approx gelu for SD2/XL's 1024/1280, src/clip.c:346-360).
"""
from __future__ import annotations

import jax.numpy as jnp

from ..tokenizer import (CLIP_VIT_BIGG_14, CLIP_VIT_H_14, CLIP_VIT_L_14,
                         ClipParams)
from . import blocks as B

__all__ = ["ClipParams", "CLIP_VIT_L_14", "CLIP_VIT_H_14", "CLIP_VIT_BIGG_14",
           "clip_text_apply"]


def clip_embeddings(ctx: B.Ctx, pre: str, tokens, P: ClipParams):
    """ref: mlb_clip_embeddings (src/clip.c:319-344). tokens: [N, n_token]."""
    tw = ctx.param(pre + ".token.weight", (P.n_vocab, P.d_embed), B.EMBED)
    pw = ctx.param(pre + ".position.weight", (P.n_token, P.d_embed), B.MAT)
    x = jnp.take(tw, tokens, axis=0)
    return x + pw.astype(x.dtype)


def clip_mlp(ctx: B.Ctx, pre: str, x, P: ClipParams):
    """ref: mlb_clip_mlp (src/clip.c:346-360)."""
    x = B.linear(ctx, pre + ".fc1", x, P.n_interm)
    if P.d_embed in (1024, 1280):  # SD2 / SDXL
        x = B.gelu_tanh(x)
    else:  # SD1
        x = B.gelu_quick(x)
    return B.linear(ctx, pre + ".fc2", x, P.d_embed)


def clip_layer(ctx: B.Ctx, pre: str, x, P: ClipParams, mask: bool = True):
    """ref: mlb_clip_layer (src/clip.c:362-377)."""
    x0 = x
    x = B.layer_norm(ctx, pre + ".norm1", x)
    x = B.attn_mhead(ctx, pre + ".attn", x, x, x, P.d_embed, P.d_embed,
                     P.n_head, mask=mask, bias=True, bias_out=True)
    x0 = x = x0 + x
    x = B.layer_norm(ctx, pre + ".norm2", x)
    x = clip_mlp(ctx, pre + ".mlp", x, P)
    return x0 + x


def clip_text_apply(ctx: B.Ctx, tokens, P: ClipParams, clip_skip: int = 0,
                    norm: bool = True, feat_tok_idx=None, pre: str = "clip",
                    feat_proj: bool = True):
    """Text encoder forward.  tokens: int32 [N, n_token].

    Returns ``(embed, feat)``: per-token embeddings [N, n_token, d_embed]
    (after optional final LayerNorm) and, if ``feat_tok_idx`` is given, the
    projected feature of that token position [N, d_embed]
    (ref: mlb_clip_text + mlb_clip_text_proj, src/clip.c:395-437).
    ``feat_proj=False`` returns the UNPROJECTED pooled row (HF
    CLIPTextModel pooler_output — what Flux conditions on; files without a
    text_projection tensor then load fine).
    """
    tpre = pre + ".text"
    x = clip_embeddings(ctx, tpre + ".embed", tokens, P).astype(ctx.dtype)
    n_eff = P.n_layer - (clip_skip - 1) if clip_skip > 1 else P.n_layer
    # With both clip_skip and a feature request (SDXL's clip2), ONE pass
    # through the full stack serves both outputs: the skip-layer hidden is
    # captured mid-stack and the feat head reads the full-depth output
    # (ref: the reference computes these as two separate graph builds,
    # src/clip.c:395-446; fusing halves the bigG encoder cost).
    n_run = P.n_layer if feat_tok_idx is not None else n_eff
    x_skip = x if n_eff == 0 else None
    for i in range(n_run):
        x = clip_layer(ctx, f"{tpre}.encoder.layers.{i}", x, P, mask=True)
        if i + 1 == n_eff:
            x_skip = x
    if x_skip is None:          # n_eff > n_run cannot happen; guard anyway
        x_skip = x
    feat = None
    if feat_tok_idx is not None:
        # feat path always uses the full stack + final norm (src/clip.c:446)
        xn = B.layer_norm(ctx, tpre + ".ln_final", x)
        rows = xn[jnp.arange(xn.shape[0]), feat_tok_idx]  # [N, d_embed]
        if feat_proj:
            p = ctx.param(tpre + ".text_proj", (P.d_embed, P.d_embed),
                          B.MAT)
            feat = jnp.dot(rows.astype(jnp.float32), p.astype(jnp.float32))
        else:
            feat = rows.astype(jnp.float32)
    x = x_skip
    if norm:
        x = B.layer_norm(ctx, tpre + ".ln_final", x)
    return x, feat


def clip_text_apply_nd(ctx: B.Ctx, tokens, P: ClipParams, **kw):
    """Window-aware ``clip_text_apply``: tokens [N, n_token] behaves
    exactly like the plain call; [N, W, n_token] encodes every 77-token
    window in one batched tower pass and concatenates the per-window
    embeddings on the sequence axis -> [N, W*n_token, d] (A1111
    long-prompt chunking).  ``feat_tok_idx`` (if given) indexes WINDOW 0
    of each row; the pooled feature is read from the first chunk."""
    if tokens.ndim == 2:
        return clip_text_apply(ctx, tokens, P, **kw)
    n, W, T = tokens.shape
    fidx = kw.pop("feat_tok_idx", None)
    if fidx is not None:
        full = jnp.zeros((n * W,), jnp.int32).at[::W].set(fidx)
    else:
        full = None
    emb, feat = clip_text_apply(ctx, tokens.reshape(n * W, T), P,
                                feat_tok_idx=full, **kw)
    emb = emb.reshape(n, W * T, emb.shape[-1])
    if feat is not None:
        feat = feat[::W]
    return emb, feat
