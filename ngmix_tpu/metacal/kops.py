"""k-space image operations for metacal.

TPU re-design of the galsim operations used by ngmix/metacal/metacal.py
(InterpolatedImage / Deconvolve / shear / dilate / Convolve /
drawImage): everything happens in the pixel-frame Fourier domain on one
padded FFT grid.

Key identities exploited:

- the lanczos15 real-space interpolant of the reference cancels exactly
  in the deconvolution I(k)/P(k) (both stamps carry the same interpolant
  response), so no real-space interpolant is needed at all;
- a WCS-distorted pixel is the unit square in pixel coordinates, so its
  k-response is a separable sinc product regardless of the WCS;
- shearing/dilating a profile is a linear remap k -> M k of its
  transform, evaluated EXACTLY: the DFT of a compact stamp is a
  trigonometric polynomial, so the remap decomposes into FFT phase
  shears plus a chirp-z axis scaling (see remap_k) with no
  interpolation kernel at all.
"""
import jax
import jax.numpy as jnp
import numpy as np


def good_fft_size(n):
    """smallest even size >= n with prime factors in {2, 3, 5}"""
    m = n + (n % 2)
    while True:
        k = m
        for p in (2, 3, 5):
            while k % p == 0:
                k //= p
        if k == 1:
            return m
        m += 2


def signed_index(N, dtype=None):
    """signed frequency indices [-N/2, N/2) in fft order, [N]"""
    return jnp.fft.fftfreq(N, d=1.0 / N).astype(dtype or jnp.result_type(float))


def kgrids(N, dtype=None):
    """pixel-frame angular frequencies (radians/pixel) in fft order.

    Returns (krow [N, 1], kcol [1, N]).
    """
    f = jnp.fft.fftfreq(N).astype(dtype or jnp.result_type(float))
    k = 2 * jnp.pi * f
    return k[:, None], k[None, :]


# Below this size, 1-D FFT passes are dispatched to a compile-time
# constant DFT matmul on the MXU instead of XLA's fft HLO. Whether this
# wins is workload-dependent (measure whole pipelines, not ops);
# toggled by set_fft_matmul.
_FFT_MATMUL_MAX_N = 0


def set_fft_matmul(max_n):
    """use DFT matmuls for 1-D FFT passes with N <= max_n (0 = off).

    The threshold is read at TRACE time: call this before the first
    invocation of any jitted pipeline. Programs already compiled keep
    the dispatch they were traced with (the flag is not part of the
    jit cache key), so flipping it later silently has no effect on
    them - re-build the pipeline fns to retrace.
    """
    global _FFT_MATMUL_MAX_N
    _FFT_MATMUL_MAX_N = int(max_n)


def _dft_w(N, inverse, dtype):
    sign = 2j if inverse else -2j
    W = np.exp(sign * np.pi * np.outer(np.arange(N), np.arange(N)) / N)
    if inverse:
        W = W / N
    return jnp.asarray(W, dtype)


def fft_axis(A, axis=-1, inverse=False):
    """1-D FFT along axis: XLA fft HLO, or an exact constant-matrix DFT
    on the MXU (Precision.HIGHEST) for small static N when enabled."""
    N = A.shape[axis]
    if N <= _FFT_MATMUL_MAX_N:
        W = _dft_w(N, inverse, jnp.result_type(A.dtype, np.complex64))
        moved = jnp.moveaxis(A, axis, -1)
        out = jnp.einsum(
            "...m,mj->...j", moved, W, precision=jax.lax.Precision.HIGHEST
        )
        return jnp.moveaxis(out, -1, axis)
    if inverse:
        return jnp.fft.ifft(A, axis=axis)
    return jnp.fft.fft(A, axis=axis)


def fft2_auto(A, inverse=False):
    """2-D FFT over the last two axes.

    Dispatches to the single fused fft2 HLO unless the DFT-matmul
    toggle covers N (two 1-D fft HLOs are measurably slower than one
    fft2, so the split only happens on the matmul path). Measured on
    v5e at the headline pipeline (N=64, B=6144): full matmul mode is
    ~9% SLOWER end-to-end than XLA's fft2, so the toggle defaults off;
    it exists because the tradeoff is hardware-generation dependent.
    """
    if A.shape[-1] <= _FFT_MATMUL_MAX_N and A.shape[-2] <= _FFT_MATMUL_MAX_N:
        return fft_axis(fft_axis(A, axis=-1, inverse=inverse),
                        axis=-2, inverse=inverse)
    if inverse:
        return jnp.fft.ifft2(A)
    return jnp.fft.fft2(A)


def centered_fft(img, cen, N):
    """FFT of a stamp with phases referenced to a (fractional) center.

    Returns khat[N, N] with khat(kappa) = sum_x img(x) e^{-i kappa.(x-cen)}
    so the profile is effectively centered at the origin.
    """
    H, W = img.shape[-2:]
    pad = jnp.zeros(img.shape[:-2] + (N, N), dtype=img.dtype)
    pad = pad.at[..., :H, :W].set(img)
    kr, kc = kgrids(N, dtype=img.dtype)
    phase = jnp.exp(1j * (kr * cen[..., 0] + kc * cen[..., 1]))
    return fft2_auto(pad) * phase


def centered_ifft(khat, cen, dims):
    """inverse of centered_fft: render a centered k-profile into a
    [dims] stamp whose center lands at (fractional) cen."""
    N = khat.shape[-1]
    kr, kc = kgrids(N)
    phase = jnp.exp(-1j * (kr * cen[..., 0] + kc * cen[..., 1]))
    full = fft2_auto(khat * phase, inverse=True).real
    return full[..., : dims[0], : dims[1]]


def pixel_kresponse(N, dtype=None):
    """k-response of the (WCS-distorted) pixel: the unit square in
    pixel coordinates -> separable sinc product. [N, N]"""
    kr, kc = kgrids(N, dtype=dtype)
    return jnp.sinc(kr / (2 * jnp.pi)) * jnp.sinc(kc / (2 * jnp.pi))


def shear_matrix(g1, g2):
    """reduced-shear coordinate matrix S (unit det) in this package's
    sky-vector ordering (v, u) = (row-like, col-like): profile.shear(g)
    means f'(x) = f(S^-1 x). In (x, y) ordering this is the standard
    [[1+g1, g2], [g2, 1-g1]] / sqrt(1-g^2); with (v, u) = (y, x) the
    diagonal swaps so that g1 > 0 elongates along u."""
    gsq = g1 * g1 + g2 * g2
    f = 1.0 / np.sqrt(1.0 - gsq)
    return np.array([[1.0 - g1, g2], [g2, 1.0 + g1]]) * f


def kmap_matrix(jac, S):
    """pixel-frame k-domain matrix for a sky-coordinate transform S:
    khat'(kappa) = khat(M kappa) with M = J^T S^T J^-T"""
    J = np.array(
        [[jac.dvdrow, jac.dvdcol], [jac.dudrow, jac.dudcol]], dtype=float
    )
    Jinv = np.linalg.inv(J)
    return J.T @ S.T @ Jinv.T


def _shift_axis(A, s, axis):
    """evaluate the trig-poly interpolant of A at j + s along axis.

    Exact for data whose conjugate-domain support fits the grid. s may
    vary along the orthogonal axes (broadcastable); this implements the
    shear factors of the remap (per-row/-column shifts).
    """
    N = A.shape[axis]
    m = signed_index(N)
    shape = [1] * A.ndim
    shape[axis] = N
    m = m.reshape(shape)
    Ahat = fft_axis(A, axis=axis)
    phase = jnp.exp(2j * jnp.pi * m * s / N)
    return fft_axis(Ahat * phase, axis=axis, inverse=True)


def _czt_scale_axis(A, b, axis, shift=None):
    """evaluate the trig-poly interpolant of A at b * (j + shift) along
    axis (j the signed fft-order index), via a Bluestein chirp
    transform. Exact.

    A(b j) = (1/N) sum_m Ahat_m e^{2 pi i m b j / N}; with
    m b j = (m^2 + j^2 - (j-m)^2) b / 2 this is a linear convolution
    against a chirp, done with zero-padded FFTs.

    ``shift`` (broadcastable over the orthogonal axes) fuses a
    preceding _shift_axis on the SAME axis into this transform: the
    shear's trailing inverse FFT cancels this function's leading FFT,
    saving two full passes. shift=None with b=1 reduces to identity.
    """
    N = A.shape[axis]
    L = good_fft_size(2 * N)
    m = np.arange(N) - N // 2  # natural-order signed index

    # frequencies of A along axis (the shear phase, if any, applies in
    # this conjugate domain with fft-order indexing)
    Ahat = jnp.fft.fft(A, axis=axis)
    if shift is not None:
        mf_shape = [1] * A.ndim
        mf_shape[axis] = N
        mf = signed_index(N).reshape(mf_shape)
        Ahat = Ahat * jnp.exp(2j * jnp.pi * mf * shift / N)
    if b == 1.0:
        return jnp.fft.ifft(Ahat, axis=axis)
    Ahat = jnp.fft.fftshift(Ahat, axes=axis)

    shape = [1] * A.ndim
    shape[axis] = N
    mg = jnp.asarray(m, A.real.dtype).reshape(shape)
    chirp = jnp.exp(1j * jnp.pi * b * mg * mg / N)
    u = Ahat * chirp

    # chirp filter over t = j - m in [-(N-1), N-1]
    t = np.arange(-(N - 1), N)
    v_np = np.exp(-1j * np.pi * b * t * t / N)
    vshape = [1] * A.ndim
    vshape[axis] = t.size
    v = jnp.asarray(v_np).reshape(vshape)

    # linear convolution via padded fft along axis
    pad_u = [(0, 0)] * A.ndim
    pad_u[axis] = (0, L - N)
    pad_v = [(0, 0)] * A.ndim
    pad_v[axis] = (0, L - t.size)
    U = jnp.fft.fft(jnp.pad(u, pad_u), axis=axis)
    V = jnp.fft.fft(jnp.pad(v, pad_v), axis=axis)
    conv = jnp.fft.ifft(U * V, axis=axis)

    # conv index q corresponds to t-origin at q = N-1, so out natural
    # index jn (j = jn - N//2) lives at q = jn + N - 1 - ... :
    # conv[q] = sum_m u[mn] v[q - mn] with v index 0 <-> t = -(N-1);
    # want t = j - m <-> v index j - m + N - 1 = (jn - N//2) - (mn - N//2) + N - 1
    # so q = jn + N - 1 - mn + mn... q = jn + (N - 1) - 0 when aligned:
    # q = jn + N - 1 - (N - 1) ... direct: q - mn = jn - mn + N - 1
    # -> q = jn + N - 1
    start = N - 1
    sl = [slice(None)] * A.ndim
    sl[axis] = slice(start, start + N)
    out_n = conv[tuple(sl)]

    jg = mg  # same signed grid
    out_n = out_n * jnp.exp(1j * jnp.pi * b * jg * jg / N) / N
    return jnp.fft.ifftshift(out_n, axes=axis)


def _scale_axis_matmul(A, b, axis, shift=None):
    """evaluate the trig-poly interpolant of A at b * (j + shift) along
    axis by direct DFT evaluation - one FFT and one [N, N] matmul on
    the MXU.

    A(b j + s) = (1/N) sum_m Ahat_m e^{2 pi i m s / N} W[m, j],
    W[m, j] = e^{2 pi i b m j / N} with signed fft-order indices, so no
    reordering or chirp padding is needed. b is static (the metacal
    remap matrix is host-side), so W is a compile-time constant. At
    stamp-scale N the MXU matmul (~N^2 multiply-adds per output row)
    beats the Bluestein chirp convolution's padded-FFT passes by ~4x;
    the chirp path (_czt_scale_axis) remains for large N where
    O(N log N) wins.
    """
    N = A.shape[axis]
    mf = np.fft.fftfreq(N, d=1.0 / N)  # signed indices, fft order
    # W computed in float64 on host precision then cast: the exponent
    # b*m*j/N reaches ~N/4 cycles and f32 phase arithmetic would lose
    # ~1e-4 there
    W = np.exp((2j * np.pi * float(b) / N) * np.outer(mf, mf)) / N
    cdtype = jnp.result_type(A.dtype, np.complex64)
    if shift is None:
        # no shear phase between the forward transform and the
        # evaluation: fold the FFT into the constant matrix (one MXU
        # matmul replaces fft + matmul). This is the 1p/1m case under
        # a diagonal WCS - a pure axis scaling.
        F = np.exp((-2j * np.pi / N) * np.outer(mf, np.arange(N)))
        Wt = jnp.asarray(F.T @ W, cdtype)
        moved = jnp.moveaxis(A, axis, -1)
        out = jnp.einsum(
            "...m,mj->...j", moved, Wt,
            precision=jax.lax.Precision.HIGHEST,
        )
        return jnp.moveaxis(out, -1, axis)
    Ahat = fft_axis(A, axis=axis)
    mf_shape = [1] * A.ndim
    mf_shape[axis] = N
    mfa = jnp.asarray(mf, A.real.dtype).reshape(mf_shape)
    Ahat = Ahat * jnp.exp(2j * jnp.pi * mfa * shift / N)
    W = jnp.asarray(W, cdtype)
    moved = jnp.moveaxis(Ahat, axis, -1)
    out = jnp.einsum(
        "...m,mj->...j", moved, W, precision=jax.lax.Precision.HIGHEST
    )
    return jnp.moveaxis(out, -1, axis)


def remap_k(khat, M, **unused):
    """khat'(kappa) = khat(M kappa), exactly.

    The k samples are a trigonometric polynomial (DFT of a compactly
    supported image), so evaluation at linearly remapped points is
    exact sinc interpolation. Decompose the unit-determinant M into an
    upper shear, an axis scaling and a lower shear
        M = [[1,a],[0,1]] diag(b, 1/b) [[1,0],[c,1]]
    and apply each factor with FFT phase shifts (shears) and chirp-z
    transforms (scaling) - ~10 one-dimensional FFT passes total, no
    interpolation kernels. This is the TPU-native replacement for the
    reference's galsim quintic k-interpolation, and is exact rather
    than approximate.
    """
    del unused
    M = np.asarray(M, dtype=float)
    if abs(M[1, 1]) < 1e-8:
        raise ValueError("remap matrix too far from identity")
    b = 1.0 / M[1, 1]
    a = M[0, 1] / M[1, 1]
    c = M[1, 0] / M[1, 1]
    # residual scaling on axis 0 so the factorization is exact even if
    # det != 1 (dilations): [[b0,0],[0,1/b]] with b0 = M[0,0] - a*c/b...
    # for det(M)=d: X(a') D(b0, 1/b) Y(c) with entries matched directly
    # X = [[1, a1],[0,1]], D = diag(d0, d1), Y = [[1,0],[c1,1]]
    # M = [[d0 + a1 d1 c1, a1 d1], [d1 c1, d1]]
    d1 = M[1, 1]
    c1 = M[1, 0] / d1
    a1d1 = M[0, 1]
    a1 = a1d1 / d1
    d0 = M[0, 0] - a1 * d1 * c1
    del a, b, c

    N = khat.shape[-1]
    idx = signed_index(N)
    iy = idx[:, None]
    ix = idx[None, :]

    # regroup X D0 D1 Y as X D0 Yt D1 with D0 = diag(d0,1),
    # D1 = diag(1,d1), Yt = [[1,0],[d1*c1,1]] (verify:
    # X D0 Yt D1 = [[d0 + a1*d1*c1, a1*d1],[d1*c1, d1]] = M), so each
    # shear immediately precedes the same-axis chirp transform and
    # fuses into its leading FFT - 6 one-dimensional passes instead
    # of 10 for the same exact evaluation.
    ct = d1 * c1
    scale_axis = _scale_axis_matmul if N <= 512 else _czt_scale_axis
    out = khat
    # X then D0 on axis -2 (shift amount a1 * col index)
    shift0 = a1 * ix if a1 != 0.0 else None
    if shift0 is not None or abs(d0 - 1.0) > 1e-14:
        out = scale_axis(out, d0, axis=-2, shift=shift0)
    # Yt then D1 on axis -1 (shift amount d1*c1 * row index)
    shift1 = ct * iy if ct != 0.0 else None
    if shift1 is not None or abs(d1 - 1.0) > 1e-14:
        out = scale_axis(out, d1, axis=-1, shift=shift1)
    return out


def partial_idft_matrix(N, start, count, dtype=np.complex128):
    """compile-time [N, count] inverse-DFT evaluation matrix for output
    rows start..start+count-1 of an N-point inverse transform:
    E[m, r] = exp(2 pi i m (start + r) / N) / N.

    Evaluating only the rows a centered crop keeps turns the inverse
    FFT into a skinny MXU matmul that does crop/N of the work - the
    partial-output analog of the remap's fused evaluation matrices.
    Host-precision phases (f64) for the same reason as
    _scale_axis_matmul's W.
    """
    m = np.fft.fftfreq(N, d=1.0 / N)
    r = start + np.arange(count)
    return np.exp((2j * np.pi / N) * np.outer(m, r)) / N


def dft2_zeropad(img, N):
    """forward 2-D DFT of an [..., H, W] real block zero-padded to
    N x N, via partial-INPUT DFT matmuls: only the H (W) nonzero input
    rows (columns) enter the contraction, and the pad buffer is never
    materialized. Exact (Precision.HIGHEST); the input-side analog of
    idft2_crop."""
    H, W = img.shape[-2:]
    mf = np.fft.fftfreq(N, d=1.0 / N)
    Fr = np.exp((-2j * np.pi / N) * np.outer(np.arange(H), mf))
    Fc = np.exp((-2j * np.pi / N) * np.outer(np.arange(W), mf))
    cdtype = jnp.result_type(img.dtype, np.complex64)
    Fr = jnp.asarray(Fr, cdtype)
    Fc = jnp.asarray(Fc, cdtype)
    out = jnp.einsum(
        "...hw,hm->...mw", img, Fr, precision=jax.lax.Precision.HIGHEST
    )
    return jnp.einsum(
        "...mw,wn->...mn", out, Fc, precision=jax.lax.Precision.HIGHEST
    )


def idft2_crop(khat, r0, c0, nrows, ncols):
    """rows r0..r0+nrows-1, cols c0..c0+ncols-1 of ifft2(khat), via two
    partial-iDFT matmuls (exact; Precision.HIGHEST)."""
    N = khat.shape[-1]
    cdtype = jnp.result_type(khat.dtype, np.complex64)
    Er = jnp.asarray(partial_idft_matrix(N, r0, nrows), cdtype)
    Ec = jnp.asarray(partial_idft_matrix(N, c0, ncols), cdtype)
    out = jnp.einsum(
        "...mn,mr->...rn", khat, Er, precision=jax.lax.Precision.HIGHEST
    )
    return jnp.einsum(
        "...rn,nc->...rc", out, Ec, precision=jax.lax.Precision.HIGHEST
    )


def deconvolve_k(imhat, psfhat, eps=1.0e-10):
    """I(k)/P(k) with an amplitude floor to keep the division finite;
    modes at the floor are strongly suppressed by the target-psf
    multiplication downstream."""
    amp = jnp.abs(psfhat)
    max_amp = jnp.max(amp, axis=(-2, -1), keepdims=True)
    floor = eps * max_amp
    safe = jnp.where(amp > floor, psfhat, floor + 0j)
    return imhat / safe


def gauss_kprofile(N, jac, sigma, flux=1.0, dtype=None):
    """k-space round gaussian of the given sky sigma, evaluated on the
    pixel-frame k grid (no pixel factor)."""
    kr, kc = kgrids(N, dtype=dtype)
    J = np.array(
        [[jac.dvdrow, jac.dvdcol], [jac.dudrow, jac.dudcol]], dtype=float
    )
    Jinv = np.linalg.inv(J)
    # k_sky = J^-T kappa
    kv = Jinv[0, 0] * kr + Jinv[1, 0] * kc
    ku = Jinv[0, 1] * kr + Jinv[1, 1] * kc
    ksq = kv * kv + ku * ku
    return flux * jnp.exp(-0.5 * sigma**2 * ksq)


def sky_kvu(N, jac, dtype=None):
    """sky-frame k components (kv, ku) on the pixel-frame fft grid"""
    kr, kc = kgrids(N, dtype=dtype)
    J = np.array(
        [[jac.dvdrow, jac.dvdcol], [jac.dudrow, jac.dudcol]], dtype=float
    )
    Jinv = np.linalg.inv(J)
    kv = Jinv[0, 0] * kr + Jinv[1, 0] * kc
    ku = Jinv[0, 1] * kr + Jinv[1, 1] * kc
    return kv, ku


def sky_ksq(N, jac, dtype=None):
    """|k_sky|^2 on the pixel-frame grid"""
    kv, ku = sky_kvu(N, jac, dtype=dtype)
    return kv * kv + ku * ku


def gauss_target_sigma(psfhat, ksq, small_kval=1.0e-2, smaller_kval=3.0e-3):
    """round-gaussian target psf size from k-power pinning.

    ref: ngmix/metacal/metacal.py:828-859 (_get_gauss_target_psf): find
    the smallest |k_sky|^2 where Re(P)/P(0) < small_kval; the target
    gaussian has smaller_kval there.
    """
    re = psfhat.real / psfhat.real[..., 0:1, 0:1]
    cond = re < small_kval
    ksq_max = jnp.min(jnp.where(cond, ksq, jnp.inf), axis=(-2, -1))
    sigma_sq = -2.0 * jnp.log(smaller_kval) / ksq_max
    return jnp.sqrt(sigma_sq)


def azgauss_target_sigma(psfhat, ksq, nbin, small_kval=3.0e-2,
                         smaller_kval=9.0e-3):
    """noise-robust round-gaussian target size from the azimuthally
    averaged k profile with log-interpolated threshold crossing.

    ref: ngmix/metacal/azgauss_target_psf.py:40-136. The annulus width
    is the grid dk (the reference uses stepk/4 of its own k image; the
    pinning is a threshold-crossing so the binning choice only shifts
    the result at the percent level).
    """
    re = psfhat.real / psfhat.real[..., 0:1, 0:1]
    kmag = jnp.sqrt(ksq)
    dk = kmag[0, 1] if kmag.ndim == 2 else kmag[..., 0, 1]
    ibin = jnp.rint(kmag / dk).astype(jnp.int32)
    ibin_flat = ibin.reshape(-1)
    num = jnp.bincount(ibin_flat, length=nbin)
    tot = jnp.bincount(ibin_flat, weights=re.reshape(-1), length=nbin)
    prof = jnp.where(num > 0, tot / jnp.where(num > 0, num, 1), jnp.inf)

    thresh = small_kval
    below = prof < thresh
    # first annulus below threshold
    i = jnp.argmax(below)
    i = jnp.maximum(i, 1)
    p0 = prof[i - 1]
    p1 = prof[i]
    pos = (p0 > 0) & (p1 > 0)
    frac_log = (jnp.log(thresh) - jnp.log(jnp.abs(p0) + 1e-300)) / (
        jnp.log(jnp.abs(p1) + 1e-300) - jnp.log(jnp.abs(p0) + 1e-300)
    )
    frac_lin = (thresh - p0) / jnp.where(p1 != p0, p1 - p0, 1.0)
    frac = jnp.where(pos, frac_log, frac_lin)
    k_cross = (i - 1 + frac) * dk
    ksq_max = k_cross**2
    sigma_sq = -2.0 * jnp.log(smaller_kval) / ksq_max
    return jnp.sqrt(sigma_sq)
