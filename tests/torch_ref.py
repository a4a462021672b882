"""Independent torch mirror of the UNet / VAE compute path.

Parity harness in the spirit of test_clip_parity.py: the JAX models are
compared against implementations built purely from torch kernels
(F.conv2d / F.group_norm / F.layer_norm / F.linear /
F.scaled_dot_product_attention), which are an independent implementation of
every numeric primitive.  Weights are shared in CHECKPOINT layout
([out,in] linear, OIHW conv) keyed by internal names: torch consumes them
natively, the JAX side routes them through the loader's layout transforms —
so a transcription error in either the math or the layout conversion shows
up as a mismatch.

(diffusers is not available in this environment; wiring-level parity against
a real checkpoint is covered separately by tools/latent_trace.py once real
weights exist — see docs/PARITY.md.)
"""
import math

import numpy as np
import torch
import torch.nn.functional as F


class TorchRef:
    """Mirror of mlimgsynth_tpu.models.blocks on torch kernels (NCHW)."""

    def __init__(self, params):
        # params: {internal_name: np.ndarray in checkpoint layout}
        self.p = {k: torch.from_numpy(np.asarray(v, np.float32))
                  for k, v in params.items()}

    # -- primitives ------------------------------------------------------

    def linear(self, pre, x, bias=True):
        return F.linear(x, self.p[pre + ".weight"],
                        self.p[pre + ".bias"] if bias else None)

    def conv2d(self, pre, x, stride=1, pad=1, bias=True):
        w = self.p[pre + ".weight"]
        b = self.p[pre + ".bias"] if bias else None
        if not isinstance(pad, int):
            (ht, hb), (wl, wr) = pad
            x = F.pad(x, (wl, wr, ht, hb))
            pad = 0
        return F.conv2d(x, w, b, stride, pad)

    def group_norm(self, pre, x, n_grp=32, eps=1e-6):
        return F.group_norm(x, n_grp, self.p[pre + ".weight"],
                            self.p[pre + ".bias"], eps)

    def layer_norm(self, pre, x, eps=1e-5):
        return F.layer_norm(x, x.shape[-1:], self.p[pre + ".weight"],
                            self.p[pre + ".bias"], eps)

    def silu(self, x):
        return F.silu(x)

    # -- composite blocks --------------------------------------------------

    def resnet(self, pre, x, emb, ch_out):
        ch_in = x.shape[1]
        x0 = x
        x = self.conv2d(pre + ".conv1", F.silu(self.group_norm(
            pre + ".norm1", x)))
        if emb is not None:
            e = self.linear(pre + ".emb_proj", F.silu(emb))
            x = x + e[:, :, None, None]
        x = self.conv2d(pre + ".conv2", F.silu(self.group_norm(
            pre + ".norm2", x)))
        if ch_in != ch_out:
            x0 = self.conv2d(pre + ".skip_conv", x0, 1, 0)
        return x + x0

    def geglu(self, pre, x, d_out):
        y = self.linear(pre + ".proj", x)
        xh, g = y[..., :d_out], y[..., d_out:]
        return xh * F.gelu(g, approximate="tanh")

    def feed_forward(self, pre, x, d_out, mult=4):
        x = self.geglu(pre + ".net.0", x, x.shape[-1] * mult)
        return self.linear(pre + ".net.2", x)

    def attn_mhead(self, pre, q, k, v, n_head, bias=False):
        n, sq = q.shape[0], q.shape[1]
        sk = k.shape[1]
        q = self.linear(pre + ".q_proj", q, bias)
        k = self.linear(pre + ".k_proj", k, bias)
        v = self.linear(pre + ".v_proj", v, bias)
        d = q.shape[-1]
        dh = d // n_head
        q = q.view(n, sq, n_head, dh).transpose(1, 2)
        k = k.view(n, sk, n_head, dh).transpose(1, 2)
        v = v.view(n, sk, n_head, dh).transpose(1, 2)
        o = F.scaled_dot_product_attention(q, k, v)
        o = o.transpose(1, 2).reshape(n, sq, d)
        return self.linear(pre + ".out_proj", o)

    def basic_transformer(self, pre, x, c, n_head):
        xn = self.layer_norm(pre + ".norm1", x)
        x = x + self.attn_mhead(pre + ".attn1", xn, xn, xn, n_head)
        xn = self.layer_norm(pre + ".norm2", x)
        x = x + self.attn_mhead(pre + ".attn2", xn, c, c, n_head)
        x = x + self.feed_forward(pre + ".ff",
                                  self.layer_norm(pre + ".norm3", x),
                                  x.shape[-1])
        return x

    def timestep_embedding(self, t, dim, max_period=10000.0):
        half = dim // 2
        freqs = torch.exp(-math.log(max_period) *
                          torch.arange(half, dtype=torch.float32) / half)
        args = t.float()[:, None] * freqs[None, :]
        return torch.cat([torch.cos(args), torch.sin(args)], dim=-1)

    def downsample(self, pre, x, vae=False):
        pad = [(0, 1), (0, 1)] if vae else 1
        return self.conv2d(pre + ".conv", x, 2, pad)

    def upsample(self, pre, x):
        x = F.interpolate(x, scale_factor=2, mode="nearest")
        return self.conv2d(pre + ".conv", x, 1, 1)

    def spatial_transformer(self, pre, x, cond, d_embed, n_head, depth):
        n, ch_in, h, w = x.shape
        x0 = x
        x = self.group_norm(pre + ".norm", x)
        x = self.conv2d(pre + ".proj_in", x, 1, 0)
        x = x.permute(0, 2, 3, 1).reshape(n, h * w, d_embed)
        for i in range(depth):
            x = self.basic_transformer(f"{pre}.transf.{i}", x, cond, n_head)
        x = x.reshape(n, h, w, d_embed).permute(0, 3, 1, 2)
        x = self.conv2d(pre + ".proj_out", x, 1, 0)
        return x + x0


def _torch_freeu(x, h, P, freeu):
    """FreeU (independent NCHW/torch.fft transcription): backbone
    half-channel scale + skip low-frequency attenuation, dispatched on
    the backbone channel count (4*n_ch -> b1/s1, 2*n_ch -> b2/s2)."""
    b1, b2, s1, s2 = freeu
    cb = x.shape[1]
    if cb == P.n_ch * 4:
        b, s = b1, s1
    elif cb == P.n_ch * 2:
        b, s = b2, s2
    else:
        return x, h
    x = x.clone()
    x[:, :cb // 2] = x[:, :cb // 2] * b
    hf = torch.fft.fftn(h.to(torch.float32), dim=(2, 3))
    hf = torch.fft.fftshift(hf, dim=(2, 3))
    H, W = h.shape[2], h.shape[3]
    mask = torch.ones((1, 1, H, W))
    mask[..., H // 2 - 1:H // 2 + 1, W // 2 - 1:W // 2 + 1] = s
    hf = torch.fft.ifftshift(hf * mask, dim=(2, 3))
    h = torch.fft.ifftn(hf, dim=(2, 3)).real.to(h.dtype)
    return x, h


def torch_unet(params, x, t, cond, label, P, pre="unet", control=None,
               freeu=None):
    """Full UNet forward on torch kernels.  x NCHW [N,4,H,W].
    ``control``: optional list of ControlNet residuals (one per encoder
    skip + middle last), added at the standard injection points."""
    R = TorchRef(params)

    def heads(d_embed):
        n_head = P.n_head or d_embed // P.d_head
        return n_head

    emb = R.linear(pre + ".time_embed.2", F.silu(R.linear(
        pre + ".time_embed.0", R.timestep_embedding(t, P.n_ch))))
    if P.ch_adm_in and label is not None:
        le = R.linear(pre + ".label_embed.2", F.silu(R.linear(
            pre + ".label_embed.0", label)))
        emb = emb + le

    x = R.conv2d(pre + ".in.conv", x)
    stack = [x]
    i_blk, ds, ch = 0, 1, P.n_ch
    n_levels = len(P.ch_mult)
    for im in range(n_levels):
        if im:
            ds *= 2
            i_blk += 1
            x = R.downsample(f"{pre}.in.{i_blk}.0", x)
            stack.append(x)
        for _ in range(P.n_res_blk):
            i_blk += 1
            ch = P.n_ch * P.ch_mult[im]
            x = R.resnet(f"{pre}.in.{i_blk}.0", x, emb, ch)
            if ds in P.attn_res:
                x = R.spatial_transformer(f"{pre}.in.{i_blk}.1", x, cond,
                                          ch, heads(ch), P.transf_depth[im])
            stack.append(x)

    im = n_levels - 1
    ch = P.n_ch * P.ch_mult[im]
    x = R.resnet(pre + ".mid.0", x, emb, ch)
    x = R.spatial_transformer(pre + ".mid.1", x, cond, ch, heads(ch),
                              P.transf_depth[im])
    x = R.resnet(pre + ".mid.2", x, emb, ch)
    ctrl = None
    if control is not None:
        assert len(control) == len(stack) + 1
        x = x + control[-1]
        ctrl = list(control[:-1])

    i_oblk = 0
    for im in range(n_levels - 1, -1, -1):
        for j in range(P.n_res_blk + 1):
            h = stack.pop()
            if ctrl is not None:
                h = h + ctrl.pop()
            if freeu is not None:
                x, h = _torch_freeu(x, h, P, freeu)
            x = torch.cat([x, h], dim=1)
            i_sub = 0
            ch = P.n_ch * P.ch_mult[im]
            x = R.resnet(f"{pre}.out.{i_oblk}.{i_sub}", x, emb, ch)
            i_sub += 1
            if ds in P.attn_res:
                x = R.spatial_transformer(f"{pre}.out.{i_oblk}.{i_sub}", x,
                                          cond, ch, heads(ch),
                                          P.transf_depth[im])
                i_sub += 1
            if im != 0 and j == P.n_res_blk:
                x = R.upsample(f"{pre}.out.{i_oblk}.{i_sub}", x)
                ds //= 2
            i_oblk += 1
    assert not stack

    x = R.conv2d(pre + ".out.conv",
                 F.silu(R.group_norm(pre + ".out.norm", x)))
    return x


def torch_controlnet(params, x, t, cond, label, hint, P, pre="cnet",
                     strength=1.0):
    """ControlNet forward on torch kernels (independent of
    models/controlnet.py): hint encoder + UNet encoder/middle copy with
    zero-conv taps.  x/hint NCHW; returns the residual list."""
    R = TorchRef(params)

    def heads(d_embed):
        return P.n_head or d_embed // P.d_head

    h = hint
    strides = (1, 1, 2, 1, 2, 1, 2)
    for i, st in enumerate(strides):
        h = F.silu(R.conv2d(f"{pre}.hint.{i}", h, stride=st))
    hint_feat = R.conv2d(f"{pre}.hint.{len(strides)}", h)

    emb = R.linear(pre + ".time_embed.2", F.silu(R.linear(
        pre + ".time_embed.0", R.timestep_embedding(t, P.n_ch))))
    if P.ch_adm_in and label is not None:
        le = R.linear(pre + ".label_embed.2", F.silu(R.linear(
            pre + ".label_embed.0", label)))
        emb = emb + le

    x = R.conv2d(pre + ".in.conv", x) + hint_feat
    outs = [R.conv2d(f"{pre}.zc.0", x, pad=0)]
    i_blk, ds, ch = 0, 1, P.n_ch
    n_levels = len(P.ch_mult)
    for im in range(n_levels):
        if im:
            ds *= 2
            i_blk += 1
            x = R.downsample(f"{pre}.in.{i_blk}.0", x)
            outs.append(R.conv2d(f"{pre}.zc.{i_blk}", x, pad=0))
        for _ in range(P.n_res_blk):
            i_blk += 1
            ch = P.n_ch * P.ch_mult[im]
            x = R.resnet(f"{pre}.in.{i_blk}.0", x, emb, ch)
            if ds in P.attn_res:
                x = R.spatial_transformer(f"{pre}.in.{i_blk}.1", x, cond,
                                          ch, heads(ch), P.transf_depth[im])
            outs.append(R.conv2d(f"{pre}.zc.{i_blk}", x, pad=0))

    im = n_levels - 1
    ch = P.n_ch * P.ch_mult[im]
    x = R.resnet(pre + ".mid.0", x, emb, ch)
    x = R.spatial_transformer(pre + ".mid.1", x, cond, ch, heads(ch),
                              P.transf_depth[im])
    x = R.resnet(pre + ".mid.2", x, emb, ch)
    outs.append(R.conv2d(pre + ".mid.out", x, pad=0))
    return [o * strength for o in outs]


def _vae_attn(R, pre, x):
    n, c, h, w = x.shape
    x0 = x
    x = R.group_norm(pre + ".norm", x)
    q = R.conv2d(pre + ".q", x, 1, 0).reshape(n, c, h * w).transpose(1, 2)
    k = R.conv2d(pre + ".k", x, 1, 0).reshape(n, c, h * w).transpose(1, 2)
    v = R.conv2d(pre + ".v", x, 1, 0).reshape(n, c, h * w).transpose(1, 2)
    o = F.scaled_dot_product_attention(q[:, None], k[:, None], v[:, None])
    o = o[:, 0].transpose(1, 2).reshape(n, c, h, w)
    return R.conv2d(pre + ".proj_out", o, 1, 0) + x0


def torch_vae_encode(params, img, P, pre="vae"):
    """img NCHW [N,3,H,W] in [-1,1] -> moments [N,8,H/8,W/8]."""
    R = TorchRef(params)
    x = R.conv2d(pre + ".encoder.conv_in", img)
    ch_blk = P.ch
    for i in range(P.n_res):
        ch_blk_out = P.ch * P.ch_mult[i]
        for j in range(P.n_res_blk):
            x = R.resnet(f"{pre}.encoder.down.{i}.block.{j}", x, None,
                         ch_blk_out)
            ch_blk = ch_blk_out
        if i + 1 != P.n_res:
            x = R.downsample(f"{pre}.encoder.down.{i}.downsample", x,
                             vae=True)
    x = R.resnet(pre + ".encoder.mid.block_1", x, None, ch_blk)
    x = _vae_attn(R, pre + ".encoder.mid.attn_1", x)
    x = R.resnet(pre + ".encoder.mid.block_2", x, None, ch_blk)
    x = R.conv2d(pre + ".encoder.conv_out",
                 F.silu(R.group_norm(pre + ".encoder.norm_out", x)))
    if getattr(P, "quant_conv", True):
        x = R.conv2d(pre + ".quant_conv", x, 1, 0)
    return x


def torch_vae_decode(params, lat, P, pre="vae"):
    """lat NCHW [N,4,h,w] (scaled) -> img [N,3,8h,8w] in [-1,1]."""
    R = TorchRef(params)
    x = lat * (1.0 / P.scale_factor) + getattr(P, "shift_factor", 0.0)
    if getattr(P, "quant_conv", True):
        x = R.conv2d(pre + ".post_quant_conv", x, 1, 0)
    ch_blk = P.ch * P.ch_mult[P.n_res - 1]
    x = R.conv2d(pre + ".decoder.conv_in", x)
    x = R.resnet(pre + ".decoder.mid.block_1", x, None, ch_blk)
    x = _vae_attn(R, pre + ".decoder.mid.attn_1", x)
    x = R.resnet(pre + ".decoder.mid.block_2", x, None, ch_blk)
    for i in range(P.n_res - 1, -1, -1):
        ch_blk_out = P.ch * P.ch_mult[i]
        for j in range(P.n_res_blk + 1):
            x = R.resnet(f"{pre}.decoder.up.{i}.block.{j}", x, None,
                         ch_blk_out)
            ch_blk = ch_blk_out
        if i != 0:
            x = R.upsample(f"{pre}.decoder.up.{i}.upsample", x)
    x = R.conv2d(pre + ".decoder.conv_out",
                 F.silu(R.group_norm(pre + ".decoder.norm_out", x)))
    return x


def torch_mmdit(params, x, t, cond, pooled, P, pre="mmdit"):
    """MMDiT forward on torch kernels (independent of models/mmdit.py):
    transcribed from the SD3 paper / sd3 reference block structure, NOT from
    the JAX code.  x NCHW [N,16,H,W]; cond [N,S,d_ctx]; pooled [N,d_pooled];
    returns the velocity field NCHW."""
    R = TorchRef(params)
    n, _, h, w = x.shape
    p, d, nh = P.patch, P.width, P.heads
    dh = d // nh
    hp, wp = h // p, w // p

    def ln(xs):
        return F.layer_norm(xs, xs.shape[-1:], eps=1e-6)

    def modulate(xs, sh, sc):
        return xs * (1.0 + sc[:, None, :]) + sh[:, None, :]

    def mod(pre2, c, k):
        y = R.linear(pre2 + ".adaLN_modulation.1", F.silu(c))
        return torch.chunk(y, k, dim=-1)

    def rms(z, wname):
        zn = z * torch.rsqrt(z.pow(2).mean(-1, keepdim=True) + 1e-6)
        return zn * R.p[wname]

    def qkv(pre2, xs):
        y = R.linear(pre2 + ".qkv", xs)
        s = y.shape[1]
        y = y.view(n, s, 3, nh, dh).permute(2, 0, 3, 1, 4)
        q, k, v = y[0], y[1], y[2]
        if P.qk_norm:
            q = rms(q, pre2 + ".ln_q.weight")
            k = rms(k, pre2 + ".ln_k.weight")
        return q, k, v

    # patchify + center-cropped pos embed
    xe = R.conv2d(pre + ".x_embedder.proj", x, stride=p, pad=0)
    xe = xe.flatten(2).transpose(1, 2)          # [N, hp*wp, d]
    g = P.pos_embed_max
    pe = R.p[pre + ".pos_embed"].view(g, g, d)
    top, left = (g - hp) // 2, (g - wp) // 2
    xe = xe + pe[top:top + hp, left:left + wp].reshape(1, hp * wp, d)

    te = R.linear(pre + ".t_embedder.mlp.2", F.silu(R.linear(
        pre + ".t_embedder.mlp.0", R.timestep_embedding(t, P.d_t_embed))))
    ye = R.linear(pre + ".y_embedder.mlp.2", F.silu(R.linear(
        pre + ".y_embedder.mlp.0", pooled)))
    c = te + ye
    cx = R.linear(pre + ".context_embedder", cond)

    for i in range(P.depth):
        cpre = f"{pre}.joint_blocks.{i}.context_block"
        xpre = f"{pre}.joint_blocks.{i}.x_block"
        pre_only = i == P.depth - 1
        dual = i in getattr(P, "x_self_attn_layers", ())
        if pre_only:
            csh, csc = mod(cpre, c, 2)
        else:
            csh, csc, cg, csh2, csc2, cg2 = mod(cpre, c, 6)
        if dual:
            (xsh, xsc, xg, xsh2, xsc2, xg2,
             x2sh, x2sc, x2g) = mod(xpre, c, 9)
        else:
            xsh, xsc, xg, xsh2, xsc2, xg2 = mod(xpre, c, 6)
        cq, ck, cv = qkv(cpre + ".attn", modulate(ln(cx), csh, csc))
        xn0 = ln(xe)
        xq, xk, xv = qkv(xpre + ".attn", modulate(xn0, xsh, xsc))
        sc_len = cx.shape[1]
        o = F.scaled_dot_product_attention(
            torch.cat([cq, xq], 2), torch.cat([ck, xk], 2),
            torch.cat([cv, xv], 2))
        xo = o[:, :, sc_len:].transpose(1, 2).reshape(n, -1, d)
        xe = xe + xg[:, None, :] * R.linear(xpre + ".attn.proj", xo)
        if dual:
            q2, k2, v2 = qkv(xpre + ".attn2", modulate(xn0, x2sh, x2sc))
            o2 = F.scaled_dot_product_attention(q2, k2, v2)
            o2 = o2.transpose(1, 2).reshape(n, -1, d)
            xe = xe + x2g[:, None, :] * R.linear(xpre + ".attn2.proj", o2)
        xe = xe + xg2[:, None, :] * R.linear(xpre + ".mlp.fc2", F.gelu(
            R.linear(xpre + ".mlp.fc1",
                     modulate(ln(xe), xsh2, xsc2)), approximate="tanh"))
        if not pre_only:
            co = o[:, :, :sc_len].transpose(1, 2).reshape(n, sc_len, d)
            cx = cx + cg[:, None, :] * R.linear(cpre + ".attn.proj", co)
            cx = cx + cg2[:, None, :] * R.linear(cpre + ".mlp.fc2", F.gelu(
                R.linear(cpre + ".mlp.fc1",
                         modulate(ln(cx), csh2, csc2)), approximate="tanh"))

    fpre = pre + ".final_layer"
    sh, sc = mod(fpre, c, 2)
    xe = R.linear(fpre + ".linear", modulate(ln(xe), sh, sc))
    xe = xe.view(n, hp, wp, p, p, P.n_ch_out)
    xe = xe.permute(0, 5, 1, 3, 2, 4).reshape(n, P.n_ch_out, hp * p, wp * p)
    return xe


def torch_flux(params, x, t, cond, pooled, P, pre="flux", guidance=None):
    """Flux forward on torch kernels, transcribed from the public flux
    reference semantics (independent of models/flux.py): rope built as
    [S, half, 2, 2] rotation matrices applied to adjacent pairs, txt++img
    double streams, parallel-attention single stream.  x NCHW [N,16,H,W];
    returns NCHW."""
    import numpy as np
    R = TorchRef(params)
    n, _, hh, ww = x.shape
    hp, wp = hh // 2, ww // 2
    d, nh = P.d_model, P.n_head
    dh = d // nh
    s_txt = cond.shape[1]

    def rms(z, name):
        zn = z.float() * torch.rsqrt(z.float().pow(2).mean(-1, keepdim=True)
                                     + 1e-6)
        return zn * R.p[name + ".scale"]

    def ln(z):
        return F.layer_norm(z, z.shape[-1:], eps=1e-6)

    def mod_vec(name, vec, k):
        return torch.chunk(R.linear(name + ".lin", F.silu(vec)), k, dim=-1)

    def modulate(z, sh, sc):
        return (1.0 + sc[:, None, :]) * z + sh[:, None, :]

    # rope rotation matrices per position (flux reference form)
    ids = np.zeros((s_txt + hp * wp, 3), np.float64)
    yy, xx = np.mgrid[0:hp, 0:wp]
    ids[s_txt:, 1] = yy.reshape(-1)
    ids[s_txt:, 2] = xx.reshape(-1)
    mats = []
    for ax, dim in enumerate(P.axes_dim):
        omega = 1.0 / (P.theta ** (np.arange(0, dim, 2, dtype=np.float64)
                                   / dim))
        ang = torch.from_numpy((ids[:, ax:ax + 1] * omega[None, :])
                               .astype(np.float32))
        m = torch.stack([torch.cos(ang), -torch.sin(ang),
                         torch.sin(ang), torch.cos(ang)], dim=-1)
        mats.append(m.reshape(ang.shape[0], ang.shape[1], 2, 2))
    pe = torch.cat(mats, dim=1)          # [S, dh//2, 2, 2]

    def rope(z):
        zf = z.float().reshape(*z.shape[:-1], -1, 1, 2)
        out = (pe[None, None, :, :, 0] * zf[..., 0]
               + pe[None, None, :, :, 1] * zf[..., 1])
        return out.reshape(z.shape)

    def qkv_split(name, z):
        y = R.linear(name + ".qkv", z)
        s = y.shape[1]
        y = y.view(n, s, 3, nh, dh).permute(2, 0, 3, 1, 4)
        q = rms(y[0], name + ".norm.query_norm")
        k = rms(y[1], name + ".norm.key_norm")
        return q, k, y[2]

    cl = P.n_ch_in // 4
    img = x.reshape(n, cl, hp, 2, wp, 2).permute(0, 2, 4, 3, 5, 1)
    img = img.reshape(n, hp * wp, P.n_ch_in)
    img = R.linear(pre + ".img_in", img)
    txt = R.linear(pre + ".txt_in", cond)

    def embed(name, z):
        return R.linear(name + ".out_layer",
                        F.silu(R.linear(name + ".in_layer", z)))

    tf = t.float() / P.n_step_train
    vec = embed(pre + ".time_in", R.timestep_embedding(tf * 1000.0, 256))
    if P.guidance_embed:
        g = (torch.zeros(n) if guidance is None else guidance.float())
        vec = vec + embed(pre + ".guidance_in",
                          R.timestep_embedding(g * 1000.0, 256))
    vec = vec + embed(pre + ".vector_in", pooled)

    for i in range(P.depth_double):
        bp = f"{pre}.double_blocks.{i}"
        ish1, isc1, ig1, ish2, isc2, ig2 = mod_vec(bp + ".img_mod", vec, 6)
        tsh1, tsc1, tg1, tsh2, tsc2, tg2 = mod_vec(bp + ".txt_mod", vec, 6)
        iq, ik, iv = qkv_split(bp + ".img_attn", modulate(ln(img), ish1,
                                                         isc1))
        tq, tk, tv = qkv_split(bp + ".txt_attn", modulate(ln(txt), tsh1,
                                                          tsc1))
        q = rope(torch.cat([tq, iq], 2))
        k = rope(torch.cat([tk, ik], 2))
        v = torch.cat([tv, iv], 2)
        o = F.scaled_dot_product_attention(q, k, v)
        o = o.transpose(1, 2).reshape(n, -1, d)
        img = img + ig1[:, None, :] * R.linear(bp + ".img_attn.proj",
                                               o[:, s_txt:])
        img = img + ig2[:, None, :] * R.linear(
            bp + ".img_mlp.2", F.gelu(R.linear(
                bp + ".img_mlp.0", modulate(ln(img), ish2, isc2)),
                approximate="tanh"))
        txt = txt + tg1[:, None, :] * R.linear(bp + ".txt_attn.proj",
                                               o[:, :s_txt])
        txt = txt + tg2[:, None, :] * R.linear(
            bp + ".txt_mlp.2", F.gelu(R.linear(
                bp + ".txt_mlp.0", modulate(ln(txt), tsh2, tsc2)),
                approximate="tanh"))

    z = torch.cat([txt, img], dim=1)
    mlp_d = P.mlp_ratio * d
    for i in range(P.depth_single):
        bp = f"{pre}.single_blocks.{i}"
        sh, sc, gate = mod_vec(bp + ".modulation", vec, 3)
        zm = modulate(ln(z), sh, sc)
        y = R.linear(bp + ".linear1", zm)
        qkv, mlp = y[..., :3 * d], y[..., 3 * d:]
        s = y.shape[1]
        qkv = qkv.view(n, s, 3, nh, dh).permute(2, 0, 3, 1, 4)
        q = rope(rms(qkv[0], bp + ".norm.query_norm"))
        k = rope(rms(qkv[1], bp + ".norm.key_norm"))
        o = F.scaled_dot_product_attention(q, k, qkv[2])
        o = o.transpose(1, 2).reshape(n, s, d)
        out = R.linear(bp + ".linear2",
                       torch.cat([o, F.gelu(mlp, approximate="tanh")], -1))
        z = z + gate[:, None, :] * out
    img = z[:, s_txt:]

    fp = pre + ".final_layer"
    y = R.linear(fp + ".adaLN_modulation.1", F.silu(vec))
    sh, sc = torch.chunk(y, 2, dim=-1)
    img = modulate(ln(img), sh, sc)
    img = R.linear(fp + ".linear", img)
    img = img.reshape(n, hp, wp, 2, 2, cl).permute(0, 5, 1, 3, 2, 4)
    return img.reshape(n, cl, hh, ww)


def torch_esrgan(state, img, n_block, unshuffle=1):
    """basicsr RRDBNet transcription (torch-layout ``state`` dict, OIHW
    convs, NCHW activations).  img [N,3,H,W] in [0,1]."""
    p = {k: torch.from_numpy(np.asarray(v, np.float32))
         for k, v in state.items()}

    def conv(pre, x):
        return F.conv2d(x, p[pre + ".weight"], p[pre + ".bias"], 1, 1)

    def lrelu(x):
        return F.leaky_relu(x, 0.2)

    def rdb(pre, x):
        x1 = lrelu(conv(pre + ".conv1", x))
        x2 = lrelu(conv(pre + ".conv2", torch.cat([x, x1], 1)))
        x3 = lrelu(conv(pre + ".conv3", torch.cat([x, x1, x2], 1)))
        x4 = lrelu(conv(pre + ".conv4", torch.cat([x, x1, x2, x3], 1)))
        x5 = conv(pre + ".conv5", torch.cat([x, x1, x2, x3, x4], 1))
        return x + 0.2 * x5

    def rrdb(pre, x):
        h = rdb(pre + ".rdb1", x)
        h = rdb(pre + ".rdb2", h)
        h = rdb(pre + ".rdb3", h)
        return x + 0.2 * h

    x = torch.from_numpy(np.asarray(img, np.float32))
    if unshuffle > 1:
        x = F.pixel_unshuffle(x, unshuffle)
    fea = conv("conv_first", x)
    h = fea
    for i in range(n_block):
        h = rrdb(f"body.{i}", h)
    fea = fea + conv("conv_body", h)
    fea = lrelu(conv("conv_up1", F.interpolate(fea, scale_factor=2,
                                               mode="nearest")))
    fea = lrelu(conv("conv_up2", F.interpolate(fea, scale_factor=2,
                                               mode="nearest")))
    out = conv("conv_last", lrelu(conv("conv_hr", fea)))
    return out.clamp(0, 1).numpy()


def torch_srvgg(state, img, n_conv, scale):
    """basicsr SRVGGNetCompact transcription (prelu activations,
    pixel-shuffle tail over a nearest-upsampled base)."""
    p = {k: torch.from_numpy(np.asarray(v, np.float32))
         for k, v in state.items()}

    def conv(i, x):
        return F.conv2d(x, p[f"body.{i}.weight"], p[f"body.{i}.bias"],
                        1, 1)

    def act(i, x):
        return F.prelu(x, p[f"body.{i}.weight"])

    x = torch.from_numpy(np.asarray(img, np.float32))
    h = act(1, conv(0, x))
    for i in range(n_conv):
        h = act(2 * i + 3, conv(2 * i + 2, h))
    h = conv(2 * n_conv + 2, h)
    out = F.pixel_shuffle(h, scale)
    out = out + F.interpolate(x, scale_factor=scale, mode="nearest")
    return out.clamp(0, 1).numpy()


def torch_clip_text(params, tokens, P, pre="clip", clip_skip=0, norm=True,
                    feat_tok_idx=None, feat_proj=True):
    """CLIP text encoder on torch kernels, mirroring the reference tower
    (mlb_clip_text, /root/reference/src/clip.c:317-446) independently of
    models/clip.py.  tokens: int64 [N, n_token] (already wrapped/padded).
    Returns (embed [N, n_token, d] f32, feat [N, d] or None)."""
    R = TorchRef(params)
    tpre = pre + ".text"
    toks = torch.from_numpy(np.asarray(tokens, np.int64))
    x = R.p[tpre + ".embed.token.weight"][toks] \
        + R.p[tpre + ".embed.position.weight"]
    n_eff = P.n_layer - (clip_skip - 1) if clip_skip > 1 else P.n_layer
    n_run = P.n_layer if feat_tok_idx is not None else n_eff
    x_skip = x if n_eff == 0 else None
    hd = P.d_embed // P.n_head
    for i in range(n_run):
        lp = f"{tpre}.encoder.layers.{i}"
        x0 = x
        h = R.layer_norm(lp + ".norm1", x)
        n, t, d = h.shape

        def _proj(name, h=h, lp=lp, n=n, t=t):
            y = F.linear(h, R.p[f"{lp}.attn.{name}.weight"],
                         R.p[f"{lp}.attn.{name}.bias"])
            return y.view(n, t, P.n_head, hd).transpose(1, 2)

        a = F.scaled_dot_product_attention(
            _proj("q_proj"), _proj("k_proj"), _proj("v_proj"),
            is_causal=True)
        a = a.transpose(1, 2).reshape(n, t, d)
        a = F.linear(a, R.p[lp + ".attn.out_proj.weight"],
                     R.p[lp + ".attn.out_proj.bias"])
        x = x0 + a
        h = R.layer_norm(lp + ".norm2", x)
        h = F.linear(h, R.p[lp + ".mlp.fc1.weight"],
                     R.p[lp + ".mlp.fc1.bias"])
        if P.d_embed in (1024, 1280):   # SD2 / SDXL towers
            h = F.gelu(h, approximate="tanh")
        else:                           # SD1: ggml_gelu_quick
            h = h * torch.sigmoid(1.702 * h)
        h = F.linear(h, R.p[lp + ".mlp.fc2.weight"],
                     R.p[lp + ".mlp.fc2.bias"])
        x = x + h
        if i + 1 == n_eff:
            x_skip = x
    feat = None
    if feat_tok_idx is not None:
        xn = R.layer_norm(tpre + ".ln_final", x)
        rows = xn[torch.arange(xn.shape[0]),
                  torch.from_numpy(np.asarray(feat_tok_idx, np.int64))]
        if feat_proj:
            feat = rows @ R.p[tpre + ".text_proj"]
        else:
            feat = rows
    x = x_skip if x_skip is not None else x
    if norm:
        x = R.layer_norm(tpre + ".ln_final", x)
    return x, feat
