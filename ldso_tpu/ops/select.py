"""Candidate-pixel selection on device.

Rebuild of the DSO pixel selector (reference: src/frontend/PixelSelector2.cc
and the gridMaxSelection templates in include/frontend/PixelSelector2.h).
The reference's sequential greedy scan over pot / 2pot / 4pot blocks becomes
a hierarchy of masked block-argmax reductions:

  * per 32x32 block: gradient histogram -> quantile threshold -> 3x3
    smoothing -> squared threshold map         (makeHists, :36-109)
  * level-1: per pot-block argmax of |grad . dir| among pixels whose level-0
    gradient exceeds the block threshold       (select, :170-315)
  * level-2/3: per 2pot/4pot block, only where no finer-level pixel passed,
    using the level-1/2 downsampled gradient with down-weighted thresholds
  * density adaptation (potential resizing + deterministic random
    subsampling) stays as a tiny host loop around the jitted kernel
    (makeMaps, :111-168)

Deviation from the reference (documented): the random selection direction is
derived from a per-block hash instead of a count-indexed random stream —
the reference's stream index depends on how many points were already
selected, which is inherently sequential; a block hash gives the same
decorrelation effect with identical determinism.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

# the 16 candidate selection directions (PixelSelector2.cc:185-201)
DIRECTIONS = np.array([
    [0, 1.0000], [0.3827, 0.9239], [0.1951, 0.9808], [0.9239, 0.3827],
    [0.7071, 0.7071], [0.3827, -0.9239], [0.8315, 0.5556], [0.8315, -0.5556],
    [0.5556, -0.8315], [0.9808, 0.1951], [0.9239, -0.3827], [0.7071, -0.7071],
    [0.5556, 0.8315], [0.9808, -0.1951], [1.0000, 0.0000], [0.1951, -0.9808],
], dtype=np.float32)

MIN_USE_GRAD = 10.0  # minUseGrad_pixsel (PixelSelector2.h:61)


# ---------------------------------------------------------------------------
# threshold map (makeHists)
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("min_grad_add", "min_grad_cut"))
def make_threshold_map(abs_grad0: jax.Array, min_grad_cut: float = 0.5,
                       min_grad_add: float = 7.0) -> jax.Array:
    """Per-32x32-block smoothed squared gradient thresholds.

    Returns (h32, w32) float32 = thsSmoothed (already squared)."""
    H, W = abs_grad0.shape
    h32, w32 = H // 32, W // 32
    g = jnp.sqrt(jnp.maximum(abs_grad0, 0.0)).astype(jnp.int32)
    g = jnp.clip(g, 0, 48)

    xs = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
    ys = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
    ok = (xs >= 1) & (xs <= W - 2) & (ys >= 1) & (ys <= H - 2)

    gc = g[: h32 * 32, : w32 * 32].reshape(h32, 32, w32, 32)
    okc = ok[: h32 * 32, : w32 * 32].reshape(h32, 32, w32, 32)
    onehot = jax.nn.one_hot(gc, 49, dtype=jnp.float32) * okc[..., None]
    hist = onehot.sum(axis=(1, 3))                      # (h32, w32, 49)
    total = hist.sum(axis=-1)

    # computeHistQuantil (PixelSelector2.cc:27-34): first i with
    # cumsum(hist[<=i]) > floor(total*cut + 0.5) - 1
    th0 = jnp.floor(total * min_grad_cut + 0.5)
    csum = jnp.cumsum(hist, axis=-1)
    passed = csum > (th0[..., None] - 0.5)
    quant = jnp.argmax(passed, axis=-1).astype(jnp.float32)
    quant = jnp.where(jnp.any(passed, axis=-1), quant, 90.0)
    ths = quant + min_grad_add

    # 3x3 edge-aware smoothing, then square (PixelSelector2.cc:67-109)
    padded = jnp.pad(ths, 1, mode="constant")
    cnt = jnp.pad(jnp.ones_like(ths), 1, mode="constant")
    s = jnp.zeros_like(ths)
    c = jnp.zeros_like(ths)
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            s = s + padded[1 + dy: 1 + dy + h32, 1 + dx: 1 + dx + w32]
            c = c + cnt[1 + dy: 1 + dy + h32, 1 + dx: 1 + dx + w32]
    sm = s / c
    return sm * sm


# ---------------------------------------------------------------------------
# hierarchical selection (select)
# ---------------------------------------------------------------------------

def _block_dir(H: int, W: int, bs: int, seed: int, salt: int) -> jax.Array:
    """Pseudo-random direction per (bs x bs) block, (H, W, 2)."""
    by = np.arange(H) // bs
    bx = np.arange(W) // bs
    hy, hx = np.meshgrid(by, bx, indexing="ij")
    idx = ((hx * 7919 + hy * 104729 + seed * 31 + salt * 1299709) % 16).astype(np.int32)
    return jnp.asarray(DIRECTIONS[idx])


def _block_winner(score: jax.Array, bs: int) -> jax.Array:
    """Bool mask of the argmax pixel per (bs x bs) block where max > 0.
    score: (H, W) with ineligible pixels <= 0."""
    H, W = score.shape
    Hp = -(-H // bs) * bs
    Wp = -(-W // bs) * bs
    s = jnp.pad(score, ((0, Hp - H), (0, Wp - W)), constant_values=-1.0)
    blocks = s.reshape(Hp // bs, bs, Wp // bs, bs).transpose(0, 2, 1, 3)
    flat = blocks.reshape(Hp // bs, Wp // bs, bs * bs)
    best = jnp.argmax(flat, axis=-1)
    mx = jnp.max(flat, axis=-1)
    win = jax.nn.one_hot(best, bs * bs, dtype=jnp.bool_) & (mx > 0.0)[..., None]
    win = win.reshape(Hp // bs, Wp // bs, bs, bs).transpose(0, 2, 1, 3)
    return win.reshape(Hp, Wp)[:H, :W]


def _block_any(mask: jax.Array, bs: int) -> jax.Array:
    """Broadcast per-block ANY back to pixel resolution."""
    H, W = mask.shape
    Hp = -(-H // bs) * bs
    Wp = -(-W // bs) * bs
    m = jnp.pad(mask, ((0, Hp - H), (0, Wp - W)))
    blocks = m.reshape(Hp // bs, bs, Wp // bs, bs)
    anyb = blocks.any(axis=(1, 3))
    out = jnp.repeat(jnp.repeat(anyb, bs, axis=0), bs, axis=1)
    return out[:H, :W]


@functools.partial(jax.jit, static_argnames=("pot", "th_factor", "seed",
                                             "grad_downweight"))
def select(dI0: jax.Array, ag0: jax.Array, ag1: jax.Array, ag2: jax.Array,
           ths_smoothed: jax.Array, pot: int, th_factor: float = 1.0,
           seed: int = 3141592, grad_downweight: float = 0.75):
    """Hierarchical candidate selection. Returns (status (H,W) int32 in
    {0,1,2,4}, counts (3,) int32)."""
    H, W = ag0.shape
    xs = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
    ys = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
    # border guard (PixelSelector2.cc:239)
    inb = (xs >= 4) & (xs < W - 5) & (ys >= 4) & (ys <= H - 4)

    # per-pixel thresholds from the 32-block map
    th_block = ths_smoothed[jnp.clip(ys >> 5, 0, ths_smoothed.shape[0] - 1),
                            jnp.clip(xs >> 5, 0, ths_smoothed.shape[1] - 1)]
    dw1 = grad_downweight
    dw2 = dw1 * dw1
    th0 = th_block * th_factor
    th1 = th_block * dw1 * th_factor
    th2 = th_block * dw1 * dw2 * th_factor

    # coarser-level gradient lookups (PixelSelector2.cc:262,276)
    x1 = (xs.astype(jnp.float32) * 0.5 + 0.25).astype(jnp.int32)
    y1 = (ys.astype(jnp.float32) * 0.5 + 0.25).astype(jnp.int32)
    ag1up = ag1[jnp.clip(y1, 0, ag1.shape[0] - 1), jnp.clip(x1, 0, ag1.shape[1] - 1)]
    x2 = (xs.astype(jnp.float32) * 0.25 + 0.125).astype(jnp.int32)
    y2 = (ys.astype(jnp.float32) * 0.25 + 0.125).astype(jnp.int32)
    ag2up = ag2[jnp.clip(y2, 0, ag2.shape[0] - 1), jnp.clip(x2, 0, ag2.shape[1] - 1)]

    grad = dI0[..., 1:3]
    dir2 = _block_dir(H, W, pot, seed, 2)
    dir3 = _block_dir(H, W, 2 * pot, seed, 3)
    dir4 = _block_dir(H, W, 4 * pot, seed, 5)

    pass0 = inb & (ag0 > th0)
    pass1 = inb & (ag1up > th1)
    pass2 = inb & (ag2up > th2)

    score0 = jnp.where(pass0, jnp.abs((grad * dir2).sum(-1)), -1.0)
    score1 = jnp.where(pass1, jnp.abs((grad * dir3).sum(-1)), -1.0)
    score2 = jnp.where(pass2, jnp.abs((grad * dir4).sum(-1)), -1.0)

    win1 = _block_winner(score0, pot)
    # levels 2/3 only fire in blocks with no finer-level pass at all
    sup2 = _block_any(pass0, 2 * pot)
    win2 = _block_winner(jnp.where(sup2, -1.0, score1), 2 * pot) & ~sup2
    sup3 = _block_any(pass0 | pass1, 4 * pot)
    win3 = _block_winner(jnp.where(sup3, -1.0, score2), 4 * pot) & ~sup3

    status = jnp.where(win1, 1, jnp.where(win2, 2, jnp.where(win3, 4, 0)))
    counts = jnp.stack([win1.sum(), win2.sum(), win3.sum()]).astype(jnp.int32)
    return status.astype(jnp.int32), counts


@functools.partial(jax.jit, static_argnames=("quotia_denom",))
def _subsample(status: jax.Array, random_pattern: jax.Array, quotia: jax.Array,
               quotia_denom: int = 0):
    """Deterministic random thinning, exactly mirroring the reference's
    count-indexed random stream (PixelSelector2.cc:149-163)."""
    flat = status.reshape(-1)
    selected = flat != 0
    rank = jnp.cumsum(selected) - 1
    char_th = (255.0 * quotia).astype(jnp.int32)
    keep = random_pattern[jnp.clip(rank, 0, random_pattern.size - 1)] > char_th
    out = jnp.where(selected & ~keep, 0, flat)
    return out.reshape(status.shape)


class PixelSelector:
    """Host-side density-adaptation wrapper (reference makeMaps recursion).

    Holds the mutable `current_potential` like the reference and the fixed
    random pattern (seeded once; PixelSelector2.cc:9-14).

    Two adaptation modes:
      * synchronous (the reference's recursion): pull the selected count,
        resize the potential and reselect immediately when the density is
        >25% off. Used for the first few calls (bootstrap) and whenever the
        caller asks (`sync=True`).
      * pipelined (steady state, documented deviation): the density
        controller runs on the PREVIOUS keyframe's count, pulled
        asynchronously — selection costs ZERO device round-trips. Behind
        the remote-TPU tunnel a synchronous pull is ~30 ms; the potential
        is stable at steady state so the one-keyframe lag is noise (the
        activation-density controller downstream buffers it further)."""

    _SYNC_CALLS = 4     # bootstrap calls that keep the reference recursion

    def __init__(self, w: int, h: int, cfg):
        self.cfg = cfg
        rng = np.random.RandomState(cfg.seed)
        self.random_pattern = jnp.asarray(
            rng.randint(0, 256, size=w * h).astype(np.int32))
        self.current_potential = 3
        self._n_calls = 0
        self._pending = None           # async (counts handle, pot, density)

    def make_maps(self, pyr, density: float, recursions_left: int = 1,
                  th_factor: float = 2.0, sync: bool = False):
        """pyr: FramePyramid (needs levels 0..2). Returns (status, n)."""
        cfg = self.cfg
        self._n_calls += 1
        ths = make_threshold_map(pyr.abs_grad[0], cfg.min_grad_hist_cut,
                                 cfg.min_grad_hist_add)
        ag1 = pyr.abs_grad[1] if pyr.levels > 1 else pyr.abs_grad[0]
        ag2 = pyr.abs_grad[2] if pyr.levels > 2 else ag1

        status, counts = select(pyr.dI[0], pyr.abs_grad[0], ag1, ag2, ths,
                                self.current_potential, th_factor,
                                cfg.seed, cfg.grad_downweight_per_level)

        if sync or self._n_calls <= self._SYNC_CALLS or self._pending is None:
            from ldso_tpu.utils.transfer import device_get
            num_have = float(device_get(counts).sum())
            pot_used = self.current_potential
        else:
            # pipelined: adapt on the previous keyframe's count
            prev_counts, pot_used, _ = self._pending
            num_have = float(np.asarray(prev_counts).sum())
        counts.copy_to_host_async()
        self._pending = (counts, self.current_potential, density)

        quotia = density / max(num_have, 1.0)
        K = num_have * (pot_used + 1) ** 2
        ideal = int(np.sqrt(K / max(density, 1.0))) - 1
        ideal = max(ideal, 1)

        if recursions_left > 0 and quotia > 1.25 and self.current_potential > 1:
            self.current_potential = min(ideal, self.current_potential - 1)
            if sync or self._n_calls <= self._SYNC_CALLS:
                return self.make_maps(pyr, density, recursions_left - 1,
                                      th_factor, sync)
        elif recursions_left > 0 and quotia < 0.25:
            self.current_potential = max(ideal, self.current_potential + 1)
            if sync or self._n_calls <= self._SYNC_CALLS:
                return self.make_maps(pyr, density, recursions_left - 1,
                                      th_factor, sync)
        else:
            self.current_potential = ideal

        if quotia < 0.95:
            status = _subsample(status, self.random_pattern,
                                jnp.float32(quotia))
            # the exact post-subsample count is only informational; the
            # expected value avoids one device round-trip per keyframe
            num_have = num_have * quotia
        return status, int(num_have)


# ---------------------------------------------------------------------------
# gridMaxSelection (initializer levels > 0; PixelSelector2.h:63-226)
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("pot", "th_fac"))
def grid_max_selection(dI: jax.Array, pot: int, th_fac: float = 1.0):
    """Per pot-block argmax of |gx|, |gy|, |gx-gy|, |gx+gy| among pixels
    with squared-grad above threshold. Returns (bool map, count)."""
    H, W = dI.shape[:2]
    gx = dI[..., 1]
    gy = dI[..., 2]
    sq = gx * gx + gy * gy
    TH = th_fac * MIN_USE_GRAD * 0.75
    xs = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
    ys = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
    # the reference scans blocks from (1,1) and skips the partial tail block
    nbx = max((W - 1 - pot) // pot + 1, 0)
    nby = max((H - 1 - pot) // pot + 1, 0)
    region = (xs >= 1) & (xs < 1 + nbx * pot) & (ys >= 1) & (ys < 1 + nby * pot)
    ok = region & (sq > TH * TH)

    # shift by (1,1) so blocks align at the origin for reshaping
    out = jnp.zeros((H, W), jnp.bool_)
    for score_raw in (jnp.abs(gx), jnp.abs(gy),
                      jnp.abs(gx - gy), jnp.abs(gx + gy)):
        score = jnp.where(ok, score_raw, -1.0)
        win = _block_winner(score[1:1 + nby * pot, 1:1 + nbx * pot], pot)
        out = out.at[1:1 + nby * pot, 1:1 + nbx * pot].set(
            out[1:1 + nby * pot, 1:1 + nbx * pot] | win)
    return out, out.sum()


def make_pixel_status(dI: jax.Array, desired_density: float,
                      recs_left: int = 5, th_fac: float = 1.0,
                      sparsity: int = 5):
    """Host density-adaptation loop (makePixelStatus, PixelSelector2.h:228-266).
    Returns (bool map, count, new_sparsity)."""
    out, n = grid_max_selection(dI, sparsity, th_fac)
    from ldso_tpu.utils.transfer import device_get
    n = int(device_get(n))
    quotia = n / max(desired_density, 1.0)
    new_sparsity = max(int(sparsity * np.sqrt(quotia) + 0.7), 1)
    old_th = th_fac
    if new_sparsity == 1 and sparsity == 1:
        th_fac = 0.5
    if ((abs(new_sparsity - sparsity) < 1 and th_fac == old_th)
            or (quotia > 0.8 and 1.0 / max(quotia, 1e-9) > 0.8)
            or recs_left == 0):
        return out, n, new_sparsity
    return make_pixel_status(dI, desired_density, recs_left - 1, th_fac,
                             new_sparsity)
