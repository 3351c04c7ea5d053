"""Naive numpy loop oracles for op tests.

The analog of the reference's inline scalar re-implementations
(/root/reference/test/test_layer/test_conv_2d.cpp:100-131 conv loop with
explicit padding bounds, etc.). Deliberately slow and obvious.
"""
import numpy as np


def conv2d_nhwc_oracle(x, w_oihw, bias=None, stride=(1, 1), padding=(0, 0),
                       dilation=(1, 1), groups=1):
    """x [N,H,W,C], w [O,I/g,KH,KW]; zero padding (pad_h, pad_w)."""
    n, h, wdt, c = x.shape
    oc, icg, kh, kw = w_oihw.shape
    sh, sw = stride
    ph, pw = padding
    dh, dw = dilation
    oh = (h + 2 * ph - dh * (kh - 1) - 1) // sh + 1
    ow = (wdt + 2 * pw - dw * (kw - 1) - 1) // sw + 1
    out = np.zeros((n, oh, ow, oc), dtype=np.float64)
    ocg = oc // groups
    for b in range(n):
        for y in range(oh):
            for xx in range(ow):
                for o in range(oc):
                    g = o // ocg
                    acc = 0.0
                    for i in range(icg):
                        ci = g * icg + i
                        for ky in range(kh):
                            iy = y * sh - ph + ky * dh
                            if iy < 0 or iy >= h:
                                continue
                            for kx in range(kw):
                                ix = xx * sw - pw + kx * dw
                                if ix < 0 or ix >= wdt:
                                    continue
                                acc += x[b, iy, ix, ci] * w_oihw[o, i, ky, kx]
                    out[b, y, xx, o] = acc
    if bias is not None:
        out += bias.reshape(1, 1, 1, -1)
    return out.astype(np.float32)


def max_pool_2d_oracle(x, kernel, stride, padding, dilation=(1, 1)):
    n, h, w, c = x.shape
    kh, kw = kernel
    sh, sw = stride
    ph, pw = padding
    dh, dw = dilation
    oh = (h + 2 * ph - dh * (kh - 1) - 1) // sh + 1
    ow = (w + 2 * pw - dw * (kw - 1) - 1) // sw + 1
    out = np.full((n, oh, ow, c), -np.inf, dtype=np.float32)
    for b in range(n):
        for y in range(oh):
            for xx in range(ow):
                for ky in range(kh):
                    iy = y * sh - ph + ky * dh
                    if iy < 0 or iy >= h:
                        continue
                    for kx in range(kw):
                        ix = xx * sw - pw + kx * dw
                        if ix < 0 or ix >= w:
                            continue
                        out[b, y, xx] = np.maximum(out[b, y, xx],
                                                   x[b, iy, ix])
    return out


def linear_oracle(x, w, b=None):
    out = x.astype(np.float64) @ w.astype(np.float64).T
    if b is not None:
        out = out + b
    return out.astype(np.float32)


def batch_norm_oracle(x, mean, var, gamma, beta, eps):
    return ((x - mean) / np.sqrt(var + eps) * gamma + beta).astype(np.float32)


def upsample_nearest_oracle(x, scale):
    n, h, w, c = x.shape
    sh, sw = scale
    oh, ow = int(h * sh), int(w * sw)
    out = np.zeros((n, oh, ow, c), dtype=x.dtype)
    for y in range(oh):
        iy = min(max(int(y * (1.0 / sh)), 0), h - 1)
        for xx in range(ow):
            ix = min(max(int(xx * (1.0 / sw)), 0), w - 1)
            out[:, y, xx] = x[:, iy, ix]
    return out
