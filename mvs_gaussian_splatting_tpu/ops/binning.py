"""Tile binning: per-tile depth-ordered Gaussian lists via one global sort.

TPU-native replacement for the CUDA rasterizer's duplicate-with-keys + radix
sort stage (SURVEY §2.9). Instead of a dynamic number of (tile, depth) key
instances, each Gaussian emits a *fixed* budget of tile instances
(``max_tiles_per_gaussian``); a single lexicographic XLA sort over
(tile_id, depth) yields contiguous per-tile segments, from which each tile
takes up to ``tile_capacity`` front-most entries.

Both caps are explicit and *reported* (`overflow_tiles`, `overflow_capacity`)
— no silent truncation. Shapes are static: the instance table is
[N · max_tiles_per_gaussian] and the output [num_tiles, tile_capacity].
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .preprocess import Processed


def _tile_in_level_set(xy, cull_r2, tx, ty, tile_w: int, tile_h: int):
    """True if the tile's pixel rect intersects the splat's alpha>=1/255
    level-set disc (squared max radius ``cull_r2``). Exactly conservative:
    pixels of culled tiles fail the compositing alpha test in every backend
    and in the CUDA reference, so culling them cannot change outputs.

    xy [N, 2] f32; cull_r2 [N] f32; tx, ty [N, d] int32.
    """
    x = xy[:, 0:1]
    y = xy[:, 1:2]
    tx_px = tx.astype(jnp.float32) * tile_w
    ty_px = ty.astype(jnp.float32) * tile_h
    dx = jnp.maximum(jnp.maximum(tx_px - x, x - (tx_px + tile_w - 1)), 0.0)
    dy = jnp.maximum(jnp.maximum(ty_px - y, y - (ty_px + tile_h - 1)), 0.0)
    return dx * dx + dy * dy <= cull_r2[:, None]


class TileBins(NamedTuple):
    gauss_idx: jnp.ndarray   # [T, K] int32 indices into the Gaussian arrays
    valid: jnp.ndarray       # [T, K] bool
    counts: jnp.ndarray      # [T] int32 total intersections per tile (pre-cap)
    overflow_tiles: jnp.ndarray     # int32: Σ tiles dropped by the per-Gaussian budget
    overflow_capacity: jnp.ndarray  # int32: Σ entries dropped by tile_capacity


def bin_gaussians(processed: Processed, tiles_x: int, tiles_y: int,
                  max_tiles_per_gaussian: int, tile_capacity: int,
                  tile_w: int = 16, tile_h: int = 16) -> TileBins:
    n = processed.xy.shape[0]
    d = max_tiles_per_gaussian
    num_tiles = tiles_x * tiles_y

    rect_min, rect_max = processed.rect_min, processed.rect_max
    span_x = jnp.maximum(rect_max[:, 0] - rect_min[:, 0], 0)
    span_y = jnp.maximum(rect_max[:, 1] - rect_min[:, 1], 0)
    area = jnp.where(processed.mask, span_x * span_y, 0)

    # Enumerate up to d tile instances per Gaussian in row-major rect order.
    j = jnp.arange(d, dtype=jnp.int32)                      # [d]
    span_x_safe = jnp.maximum(span_x, 1)
    ty = rect_min[:, 1, None] + j[None, :] // span_x_safe[:, None]
    tx = rect_min[:, 0, None] + j[None, :] % span_x_safe[:, None]
    inst_valid = j[None, :] < jnp.minimum(area, d)[:, None]  # [n, d]
    inst_valid &= _tile_in_level_set(processed.xy, processed.cull_r2, tx, ty,
                                     tile_w, tile_h)
    tile_id = jnp.where(inst_valid, ty * tiles_x + tx, num_tiles).astype(jnp.int32)

    overflow_tiles = jnp.maximum(area - d, 0).sum().astype(jnp.int32)

    depth_key = jnp.broadcast_to(processed.depth[:, None], (n, d))
    gauss_id = jnp.broadcast_to(
        jnp.arange(n, dtype=jnp.int32)[:, None], (n, d))

    tile_sorted, _, idx_sorted = jax.lax.sort(
        (tile_id.reshape(-1), depth_key.reshape(-1), gauss_id.reshape(-1)),
        num_keys=2, is_stable=True)

    # Per-tile segment boundaries in the sorted instance table.
    tile_range = jnp.arange(num_tiles, dtype=jnp.int32)
    starts = jnp.searchsorted(tile_sorted, tile_range, side="left").astype(jnp.int32)
    ends = jnp.searchsorted(tile_sorted, tile_range, side="right").astype(jnp.int32)
    counts = ends - starts

    k = jnp.arange(tile_capacity, dtype=jnp.int32)
    take = starts[:, None] + k[None, :]                      # [T, K]
    valid = k[None, :] < jnp.minimum(counts, tile_capacity)[:, None]
    gauss_idx = jnp.where(valid, idx_sorted[jnp.clip(take, 0, n * d - 1)], 0)

    overflow_capacity = jnp.maximum(counts - tile_capacity, 0).sum().astype(jnp.int32)

    return TileBins(gauss_idx=gauss_idx, valid=valid, counts=counts,
                    overflow_tiles=overflow_tiles,
                    overflow_capacity=overflow_capacity)


class StreamBins(NamedTuple):
    """Instance-stream layout: the tile-sorted instance list itself, consumed
    segment-direct by ops/pallas/stream.py (no region re-layout).

    Instances are identified by their DEPTH RANK (row into the depth-sorted
    Gaussian order), not the raw Gaussian index: consumers gather attributes
    from a depth-permuted table (``table[order]``) so that, when tile and
    rank bits fit in an i32, the tile sort runs on one packed key array with
    no payload operand. ``order[inst_rank]`` recovers Gaussian indices."""

    inst_rank: jnp.ndarray      # [CAP + CHUNK] int32 depth-rank per slot
    inst_valid: jnp.ndarray     # [CAP + CHUNK] bool
    order: jnp.ndarray          # [N] int32 depth-ascending Gaussian order
    seg_start: jnp.ndarray      # [T] int32 segment offsets (UNALIGNED)
    counts: jnp.ndarray         # [T] int32 valid instances per tile (clipped)
    counts_raw: jnp.ndarray     # [T] int32 pre-clip intersection counts
    overflow_tiles: jnp.ndarray
    overflow_capacity: jnp.ndarray
    # visible Gaussians dropped by RasterConfig.visible_cap truncation
    # (0 unless the caller enables visible-prefix compaction)
    overflow_visible: jnp.ndarray = np.zeros((), np.int32)
    # measured per-frame tier demand: count of rows with rect area >
    # tier_budgets[i] — feedback for scene-calibrated tier_fracs (round 5:
    # the static (0.25, 0.1) fracs over-enumerate sort keys ~2x on dense
    # close-up scenes like fern; a measured frac + margin trims the packed
    # sort/enumeration without coverage loss, overflow_tiles still guards)
    tier_counts: jnp.ndarray = np.zeros((0,), np.int32)


def _tier_layout(n: int, max_tiles_per_gaussian: int, tier_budgets,
                 tier_fracs):
    """(budgets, caps) for the tiered enumeration; validates nesting.

    caps are the area-rank prefix lengths per upgraded tier:
    min(n, max(512, n·frac)) — floored at 512 rows (so small scenes always
    get full budgets) but never more rows than exist. Fracs must be
    non-increasing: an increasing frac would enumerate a Gaussian's high tile
    slots without its middle ones, silently dropping tiles."""
    d = max_tiles_per_gaussian
    budgets = [int(b) for b in tier_budgets if int(b) < d]
    fracs = tuple(tier_fracs)[:len(budgets)]
    if any(f2 > f1 for f1, f2 in zip(fracs, fracs[1:])):
        raise ValueError(f"tier_fracs must be non-increasing (nested "
                         f"prefixes), got {tier_fracs}")
    caps = [min(n, max(512, int(n * f))) for f in fracs]
    return budgets, caps


def stream_instance_bound(n: int, max_tiles_per_gaussian: int,
                          tier_budgets=(4, 12),
                          tier_fracs=(0.25, 0.1)) -> int:
    """Exact worst-case instance-slot count of :func:`bin_instances_stream`
    for ``n`` Gaussians (every Gaussian filling its tier budget)."""
    d = max_tiles_per_gaussian
    budgets, caps = _tier_layout(n, d, tier_budgets, tier_fracs)
    if not budgets:
        return n * d
    bounds = [0] + budgets + [d]
    total = n * budgets[0]
    for t in range(1, len(bounds) - 1):
        total += caps[t - 1] * (bounds[t + 1] - bounds[t])
    return total


def auto_instance_cap(n: int, max_tiles_per_gaussian: int, tile_w: int,
                      tile_h: int, tier_budgets=(4, 12),
                      tier_fracs=(0.25, 0.1)) -> int:
    """Default stream instance capacity (CHUNK-aligned).

    Expected tiles/Gaussian ≈ (1 + 2r̄/tw)(1 + 2r̄/th); with a typical splat
    footprint (2r̄ ≈ 21 px at 1080p loads) and a 1.5× safety margin this
    lands at 8·N for 16×16 tiles. Clipped to the exact tier bound; shortfall
    is counted in aux["overflow_capacity"], never silent."""
    bound = stream_instance_bound(n, max_tiles_per_gaussian, tier_budgets,
                                  tier_fracs)
    k = 1.5 * (1.0 + 21.0 / tile_w) * (1.0 + 21.0 / tile_h)
    cap = min(max(int(k * n), 1024), bound)
    return cap + (-cap) % 128


_FRAC_GRID = (0.0, 1 / 256, 1 / 128, 1 / 64, 1 / 32, 1 / 16, 1 / 8, 1 / 4,
              1 / 2, 1.0)


def adaptive_tier_layout(needs, max_tiles_per_gaussian: int, tier_budgets,
                         tier_fracs, margin: float = 1.1,
                         slot_limit: int = 16_000_000,
                         quantize: bool = False):
    """Size a tier layout from MEASURED per-Gaussian tile needs so that no
    splat is clipped to a partial tile patch (offline-eval use).

    ``needs``: per-Gaussian worst-case tile count over the eval cameras —
    the projected rect area from :func:`rect_table` geometry (an upper bound
    on the enumerated tiles; level-set culling only shrinks it). Within any
    single frame, the rows whose area exceeds a tier threshold are by
    definition the top ``count`` of that frame's area ranking, and per-frame
    counts are bounded by the max-over-cameras counts here — so caps sized
    from these counts make the tiered enumeration EXACTLY equal to the flat
    ``max_tiles_per_gaussian`` budget, per frame, by construction. ``margin``
    absorbs area-rank ties at the prefix boundary.

    Returns ``(d, budgets, fracs, n_clipped)``: the (possibly escalated)
    top budget, the filtered budget ladder, per-tier fracs (elementwise max
    of the adaptive counts and the caller's ``tier_fracs`` — user generosity
    wins), and the number of rows whose need still exceeds their assigned
    budget after the ``slot_limit`` memory guard (0 unless the guard bit;
    callers MUST surface a nonzero count — no silent caps).

    Rationale: tier caps are fractions of n, so the same trained model gets
    *different* per-Gaussian budgets depending on the row count it is
    rendered with — the train loop renders a padded capacity bucket while
    offline render uses the exact compacted N, which clipped big smooth
    splats at tile boundaries and cost ~0.9 dB on a view-dependent scene
    (runs/specscale, round 4: loop eval 27.99 vs offline 27.09). Measuring
    the actual needs removes the n-dependence entirely.
    """
    needs = np.asarray(needs)
    n = int(needs.shape[0])
    need_max = int(needs.max()) if n else 0
    d = int(max_tiles_per_gaussian)
    while d < need_max:
        d *= 2
    budgets = tuple(int(b) for b in tier_budgets if int(b) < d)
    if not budgets:                       # flat layout: every row gets d
        bound = n * d
        n_clipped = 0
        if bound > slot_limit:
            d = max(1, slot_limit // max(n, 1))
            n_clipped = int((needs > d).sum())
        return d, (), (), n_clipped

    counts = [int((needs > b).sum()) for b in budgets]
    base = tuple(tier_fracs)[:len(budgets)] + (0.0,) * (len(budgets)
                                                        - len(tier_fracs))
    fracs = [min(1.0, max(f, margin * c / max(n, 1)))
             for f, c in zip(base, counts)]
    # counts are nested (needs>64 ⊆ needs>12 ⊆ needs>4) and base is
    # non-increasing, so the elementwise max is non-increasing too.
    if quantize:
        # round UP to a coarse power-of-two grid (coverage only grows) so
        # jitted eval surfaces keyed on the layout recompile only when a
        # tier crosses a bucket — applied BEFORE the slot-limit guard so
        # every caller that quantizes makes identical clip decisions (the
        # in-loop eval and cli/render must render the same image)
        fracs = [next(q for q in _FRAC_GRID if f <= q) for f in fracs]

    def caps_of(fr):
        return [min(n, max(512, int(n * f))) for f in fr]

    bound = stream_instance_bound(n, d, budgets, fracs)
    if bound > slot_limit:
        # Scale the adaptive surplus back toward the caller's fracs until the
        # bound fits; count what that clips instead of hiding it.
        lo, hi = 0.0, 1.0
        for _ in range(30):
            mid = (lo + hi) / 2
            trial = [b + mid * (a - b) for a, b in zip(fracs, base)]
            if stream_instance_bound(n, d, budgets, trial) <= slot_limit:
                lo = mid
            else:
                hi = mid
        fracs = [b + lo * (a - b) for a, b in zip(fracs, base)]
        if stream_instance_bound(n, d, budgets, fracs) > slot_limit:
            # Even the caller's base fracs exceed the limit (the bisection
            # can only shrink toward them, not below, and never touches the
            # n·budgets[0] floor term) — shrink the whole ladder uniformly.
            s_lo, s_hi = 0.0, 1.0
            for _ in range(30):
                mid = (s_lo + s_hi) / 2
                trial = [f * mid for f in fracs]
                if stream_instance_bound(n, d, budgets, trial) <= slot_limit:
                    s_lo = mid
                else:
                    s_hi = mid
            fracs = [f * s_lo for f in fracs]
            if stream_instance_bound(n, d, budgets, fracs) > slot_limit:
                # still too big: the floor term n·budgets[0] alone exceeds
                # the limit — drop to the flat-layout clamp
                d_flat = max(1, slot_limit // max(n, 1))
                n_clipped = int((needs > d_flat).sum())
                return d_flat, (), (), n_clipped
        caps = caps_of(fracs)
        order = np.argsort(-needs, kind="stable")
        assigned = np.full(n, budgets[0], np.int64)
        ladder = list(budgets[1:]) + [d]
        for cap, b in zip(caps, ladder):
            assigned[order[:cap]] = b
        n_clipped = int((needs > assigned).sum())
    else:
        n_clipped = 0
    return d, budgets, tuple(fracs), n_clipped


def rect_table(processed: Processed) -> jnp.ndarray:
    """[N, 8] f32 rect/cull row per Gaussian (binning's internal layout:
    rect_min, rect_max, mask, xy, cull_r2). Exposed so callers that already
    gather per-Gaussian attribute rows in depth order can append these 8
    columns and hand the ordered view to :func:`bin_instances_stream` —
    TPU row-gathers cost ~15 ns/row *independent of row width*, so fusing
    the two gathers saves a whole [N]-row gather."""
    return jnp.concatenate(
        [processed.rect_min.astype(jnp.float32),
         processed.rect_max.astype(jnp.float32),
         processed.mask[:, None].astype(jnp.float32),
         processed.xy, processed.cull_r2[:, None]], axis=1)


def bin_instances_stream(processed: Processed, tiles_x: int, tiles_y: int,
                         max_tiles_per_gaussian: int, cap: int,
                         chunk: int = 128, tile_w: int = 16,
                         tile_h: int = 16,
                         tier_budgets=(4, 12),
                         tier_fracs=(0.25, 0.1),
                         round_robin: int = 0,
                         order: Optional[jnp.ndarray] = None,
                         rect_ordered: Optional[jnp.ndarray] = None) -> StreamBins:
    """Depth-presorted, single-key tile sort consumed in segment layout.

    Gaussians are depth-sorted once (N entries), instances enumerated in that
    order, then stably sorted by tile id alone — stability preserves depth
    order within each tile, replacing the 2-key (tile, depth) sort with a
    cheaper single-key sort. The sorted instance list IS the output: per-tile
    segments start at unaligned ``seg_start`` offsets and the stream kernels
    DMA directly from them, so there is no chunk-aligned region re-layout
    (which cost a [CAP] scalar gather + three [CAP] cumsums and ~60% slot
    padding at typical loads). ``CHUNK`` slack columns at the tail absorb the
    last tile's chunk-granular DMA spill. All truncation is counted, never
    silent.

    Tiered instance budgets: a flat per-Gaussian budget of
    ``max_tiles_per_gaussian`` wastes most sort traffic (median rect area is
    a few tiles; the p99 tail needs the full budget). Instead every Gaussian
    gets ``tier_budgets[0]`` slots, the largest ``tier_fracs[0]·N`` (by rect
    area, one argsort) get budget ``tier_budgets[1]``, the largest
    ``tier_fracs[1]·N`` the full ``max_tiles_per_gaussian`` — nested
    area-rank prefixes, so the emitted tile set per Gaussian is identical to
    the flat budget whenever each tier's prefix covers every Gaussian larger
    than its threshold (each prefix is floored at min(N, 512), so small
    scenes are always exact). Shortfall is counted in ``overflow_tiles``,
    never silent. Pass ``tier_budgets=()`` for the flat single-tier layout.

    ``round_robin=D`` (D > 0) remaps tile ids destination-major before the
    sort: tile ``t`` sorts under key ``(t mod D)·⌈T/D⌉ + t div D``, so the
    instances owned by round-robin shard d (tiles ≡ d mod D — the load-
    balanced assignment from SURVEY §7 "hard parts") form ONE contiguous
    slice of the stream, ready for a fixed-quota dynamic-slice exchange
    (parallel/gauss_stream.py). ``seg_start``/``counts`` then have length
    ``D·⌈T/D⌉`` and index position ``k`` = original tile
    ``(k mod ⌈T/D⌉)·D + k div ⌈T/D⌉`` (padding positions are empty).

    ``order``/``rect_ordered``: optional precomputed depth order and the
    depth-ordered :func:`rect_table` rows — callers that gather attribute
    rows by the same order pass both so the [N]-row rect gather fuses into
    their attribute gather (see ``rect_table``). Must be exactly
    ``argsort(where(mask, depth, inf))`` and ``rect_table(processed)[order]``
    — or a PREFIX of that order (visible-prefix compaction, round 4: masked
    rows carry depth=inf so they sort to the tail; a caller that knows a
    bound V on the visible count passes ``order[:V]`` and every per-row
    stage here — tile enumeration, tier ranking, the instance sort — runs
    on V rows instead of N; ``inst_rank`` then indexes the truncated order).
    """
    n = order.shape[0] if order is not None else processed.xy.shape[0]
    d = max_tiles_per_gaussian
    num_tiles = tiles_x * tiles_y
    if round_robin:
        t_per_rr = -(-num_tiles // round_robin)
        t_out = round_robin * t_per_rr
    else:
        t_per_rr = 0
        t_out = num_tiles

    if order is None:
        depth_key = jnp.where(processed.mask, processed.depth, jnp.inf)
        order = jnp.argsort(depth_key, stable=True).astype(jnp.int32)  # [N]
    if rect_ordered is None:
        # one row-gather for all rect data (scalar gathers are slow on TPU);
        # rect coords carried as f32 (exact for values < 2^24)
        rect_ordered = rect_table(processed)[order]                # [N, 8]
    rect_o = rect_ordered
    rect_oT = rect_o.T                         # [8, N]: enumeration works in
    # attribute-major layout — [N, w] intermediates with w ∈ {4, 8, 20} are
    # lane-padded to 128 on TPU (up to 32× memory traffic); [w, N] tiles
    # cleanly. Measured: 9.4 → 4.7 ms at the 1080p/200K load (exp_binning2).
    rect_min = rect_o[:, 0:2].astype(jnp.int32)
    rect_max = rect_o[:, 2:4].astype(jnp.int32)
    mask_o = rect_o[:, 4] > 0
    span_x = jnp.maximum(rect_max[:, 0] - rect_min[:, 0], 0)
    span_y = jnp.maximum(rect_max[:, 1] - rect_min[:, 1], 0)
    area = jnp.where(mask_o, span_x * span_y, 0)

    rank_bits = max((n - 1).bit_length(), 1)
    tile_bits = (t_out + 1 - 1).bit_length()
    packed = rank_bits + tile_bits <= 31
    sentinel = ((t_out << rank_bits) if packed else t_out)
    # f32-reciprocal div: floor((j+0.5)·(1/sx)) == j // sx exactly while
    # j, sx < 2^12 (the +0.5 keeps the product mid-interval, so the 2^-24
    # reciprocal error can't cross a floor boundary). Integer div/mod by a
    # runtime vector is a multi-op software sequence on the VPU.
    assert d <= 4096, "f32-reciprocal tile div requires budgets < 2^12"

    def enumerate_tier(rows, lo: int, hi: int, row_area, row_rectT):
        """Instance keys for tile slots j∈[lo,hi) of the Gaussians in
        ``rows`` (depth-rank indices). row_rectT is [8, M] (transposed);
        returns flat [(hi-lo)·M] key/tile/rank arrays (slot-major — order
        is irrelevant: the packed key carries (tile, rank) fully and rank
        is a real sort key in the unpacked fallback)."""
        j = (lo + jnp.arange(hi - lo, dtype=jnp.int32))[:, None]   # [w, 1]
        rminx = row_rectT[0:1, :].astype(jnp.int32)
        rminy = row_rectT[1:2, :].astype(jnp.int32)
        rmaxx = row_rectT[2:3, :].astype(jnp.int32)
        sx = jnp.maximum(jnp.maximum(rmaxx - rminx, 0), 1)
        q = jnp.floor((j.astype(jnp.float32) + 0.5)
                      / sx.astype(jnp.float32)).astype(jnp.int32)
        ty = rminy + q
        tx = rminx + (j - q * sx)
        valid = j < jnp.minimum(row_area, hi)[None, :]
        x, y = row_rectT[5:6, :], row_rectT[6:7, :]
        cull_r2 = row_rectT[7:8, :]
        tx_px = tx.astype(jnp.float32) * tile_w
        ty_px = ty.astype(jnp.float32) * tile_h
        ddx = jnp.maximum(jnp.maximum(tx_px - x, x - (tx_px + tile_w - 1)),
                          0.0)
        ddy = jnp.maximum(jnp.maximum(ty_px - y, y - (ty_px + tile_h - 1)),
                          0.0)
        valid &= ddx * ddx + ddy * ddy <= cull_r2
        tid = (ty * tiles_x + tx).astype(jnp.int32)
        if round_robin:
            tid = (tid % round_robin) * t_per_rr + tid // round_robin
        tid = jnp.where(valid, tid, t_out)
        rk = jnp.broadcast_to(rows[None, :], tid.shape)
        if packed:
            key = jnp.where(valid, (tid << rank_bits) | rk, sentinel)
            return key.reshape(-1), None
        return tid.reshape(-1), rk.reshape(-1)

    budgets, caps = _tier_layout(n, d, tier_budgets, tier_fracs)
    if budgets:
        # Area ranking as ONE packed-key sort: area ≤ num_tiles, so
        # ((maxa − area) << rank_bits) | idx sorts area-descending with
        # index tiebreak — identical order to stable argsort(-area), no
        # payload operand, and area_sorted unpacks from the key (saves the
        # [N] element gather area[aorder]).
        area_bits = num_tiles.bit_length()
        if rank_bits + area_bits <= 31:
            maxa = jnp.int32(num_tiles)
            akey = ((maxa - area) << rank_bits) | jnp.arange(
                n, dtype=jnp.int32)
            (asorted,) = jax.lax.sort((akey,), num_keys=1, is_stable=False)
            aorder = (asorted & ((1 << rank_bits) - 1)).astype(jnp.int32)
            area_sorted = maxa - (asorted >> rank_bits)
        else:
            aorder = jnp.argsort(-area, stable=True).astype(jnp.int32)
            area_sorted = area[aorder]
        bounds = [0] + budgets + [d]           # tier j-ranges
        tiles_flat, ranks_flat = [], []
        rows0 = jnp.arange(n, dtype=jnp.int32)
        for t, (lo, hi) in enumerate(zip(bounds[:-1], bounds[1:])):
            if t == 0:
                k, r = enumerate_tier(rows0, lo, hi, area, rect_oT)
            else:
                m = caps[t - 1]
                rows = aorder[:m]
                k, r = enumerate_tier(rows, lo, hi, area_sorted[:m],
                                      rect_oT[:, rows])
            tiles_flat.append(k)
            ranks_flat.append(r)
        tile_or_key = jnp.concatenate(tiles_flat)
        rank_flat = (None if packed else jnp.concatenate(ranks_flat))
        # budget actually granted per area-rank position (static prefixes)
        pos = jnp.arange(n, dtype=jnp.int32)
        bud = jnp.full((n,), budgets[0], jnp.int32)
        for t in range(1, len(bounds) - 1):
            bud = jnp.where(pos < caps[t - 1], bounds[t + 1], bud)
        overflow_tiles = jnp.maximum(area_sorted - bud, 0).sum().astype(jnp.int32)
    else:
        k, r = enumerate_tier(jnp.arange(n, dtype=jnp.int32), 0, d, area,
                              rect_oT)
        tile_or_key, rank_flat = k, r
        overflow_tiles = jnp.maximum(area - d, 0).sum().astype(jnp.int32)

    if packed:
        # One packed key, no payload operand: halves sort data movement.
        # Rank low bits make every key unique, so the non-stable single-key
        # sort reproduces the stable (tile, depth) order of a 2-key sort.
        (sorted_key,) = jax.lax.sort((tile_or_key,), num_keys=1,
                                     is_stable=False)
        sorted_rank = None                     # sliced from sorted_key below
        bound = lambda t: (t << rank_bits).astype(jnp.int32)
        sorted_for_search = sorted_key
    else:
        # Unique (tile, rank) pairs again; rank is a real second sort key.
        sorted_tile, sorted_rank = jax.lax.sort(
            (tile_or_key, rank_flat), num_keys=2, is_stable=False)
        bound = lambda t: t.astype(jnp.int32) if hasattr(t, "astype") else jnp.int32(t)
        sorted_for_search = sorted_tile

    # Segment offsets via searchsorted probes (a sorted-histogram scatter +
    # cumsum variant measured 2x SLOWER in context on hardware despite a
    # faster isolated micro-time — exp_binning4, round 5; don't reopen
    # without an in-context measurement).
    tile_range = jnp.arange(t_out, dtype=jnp.int32)
    seg_start = jnp.searchsorted(sorted_for_search, bound(tile_range),
                                 side="left").astype(jnp.int32)
    n_valid = jnp.searchsorted(sorted_for_search, bound(jnp.int32(t_out)),
                               side="left").astype(jnp.int32)
    seg_end = jnp.concatenate([seg_start[1:], n_valid[None]])
    counts_raw = seg_end - seg_start

    # Segments past `cap` are truncated depth-last (per tile), counted.
    counts = jnp.clip(cap - seg_start, 0, counts_raw)
    overflow_capacity = (counts_raw.sum() - counts.sum()).astype(jnp.int32)
    # Clamp truncated segment offsets into the buffer: a tile whose segment
    # begins past `cap` has count 0, but an unclamped start would make the
    # stream kernels compute a 128-aligned DMA window beyond [16, cap+CHUNK]
    # (out-of-bounds HBM reads fwd / writes bwd on real hardware). cap is
    # CHUNK-aligned, so a clamped empty segment yields n_chunks == 0.
    seg_start = jnp.minimum(seg_start, cap)

    total = cap + chunk  # slack for the last tile's chunk-granular DMA spill
    if packed:
        # slice BEFORE unmasking the rank bits — no pass over the tail
        m = sorted_key.shape[0]
        sk = sorted_key[:total] if m >= total else jnp.pad(
            sorted_key, (0, total - m), constant_values=sentinel)
        sr = sk & ((1 << rank_bits) - 1)
    else:
        m = sorted_rank.shape[0]
        sr = (sorted_rank[:total] if m >= total
              else jnp.pad(sorted_rank, (0, total - m)))
    q = jnp.arange(total, dtype=jnp.int32)
    valid_q = q < jnp.minimum(n_valid, cap)
    inst_rank = jnp.where(valid_q, sr, 0)

    if budgets:
        tier_counts = jnp.stack([(area > b).sum().astype(jnp.int32)
                                 for b in budgets])
    else:
        tier_counts = jnp.zeros((0,), jnp.int32)

    return StreamBins(inst_rank=inst_rank, inst_valid=valid_q, order=order,
                      seg_start=seg_start, counts=counts,
                      counts_raw=counts_raw,
                      overflow_tiles=overflow_tiles,
                      overflow_capacity=overflow_capacity,
                      tier_counts=tier_counts)
