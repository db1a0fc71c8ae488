"""Multi-chip rendering: image tile rows sharded over the mesh.

Design (SURVEY.md §2.4 / BASELINE config 5):
  * Gaussian parameters REPLICATED on every chip (they are the "weights");
  * the image's tile rows sharded over the ``tiles`` mesh axis: each chip
    projects all splats (cheap, embarrassingly parallel recompute — avoids
    an all-gather of culled lists), bins only the splats touching its band,
    and runs the Pallas/XLA blend on its band;
  * the output image is left sharded by rows (devices hold their bands);
  * under jax.grad, shard_map's transpose inserts ONE psum over the scene
    gradients — the gradient all-reduce rides ICI and XLA overlaps it with
    the remaining backward work.

The tile-row count is padded to a multiple of the mesh size; padded rows
render background and are cropped off.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P
from jax import shard_map

from gaussiansplattingviewer_tpu.config import RenderConfig
from gaussiansplattingviewer_tpu.models.gaussians import GaussianData
from gaussiansplattingviewer_tpu.ops import binning
from gaussiansplattingviewer_tpu.ops.blend import blend_tiles
from gaussiansplattingviewer_tpu.ops.compaction import (
    compact_by_mask,
    compact_splats,
    pack_splats,
    unpack_splats,
)
from gaussiansplattingviewer_tpu.ops.projection import project
from gaussiansplattingviewer_tpu.parallel.mesh import TILE_AXIS


def _rows_per_shard(cfg: RenderConfig, n_shards: int) -> int:
    return -(-cfg.tiles_y // n_shards)


def _round_budget(b: int, n: int) -> int:
    return min(n, max(-(-b // 1024) * 1024, 4096))


def _exchange_parts(splats, cfg: RenderConfig, rows: int, n_shards: int,
                    exchange_budget_factor: float, row_stride: int = 1):
    """Send side of exchange mode: partition this chip's projected splats
    by destination tile-row owner.  Returns (rows (n_shards, budget, 12),
    valid (n_shards, budget), kept (n_shards, budget)) — one all_to_all
    away from every chip holding exactly the splats touching its rows.
    Factored out so scripts/scaling.py can time one shard's send-side
    compute standalone (collectives can't run single-device).

    row_stride == 1: chip d owns the contiguous band [d*rows, (d+1)*rows);
    row_stride == n_shards: chip d owns the interleaved rows {d + s*n} —
    the load-balanced assignment.  A splat goes to chip d iff its global
    tile-row span [y0, y1] contains a row ≡ d (mod n): (d - y0) mod n <=
    y1 - y0.  (rows is a static Python int so // lowers to multiply-shift,
    not the bit-serial traced-divisor path, see binning._floordiv_small.)
    """
    n_loc = splats.valid.shape[0]
    _, y0g, _, hh, cnt, _ = binning.tile_bbox(splats, cfg)
    live = cnt > 0
    frac = min(1.0, rows / cfg.tiles_y * exchange_budget_factor)
    budget = _round_budget(int(n_loc * frac), n_loc)
    if row_stride == 1:
        d0 = jnp.clip(y0g // rows, 0, n_shards - 1)
        d1 = jnp.clip((y0g + hh - 1) // rows, 0, n_shards - 1)

        def dest_mask(d):
            return live & (d0 <= d) & (d <= d1)
    else:
        assert row_stride == n_shards
        span = hh - 1  # y1 - y0

        def dest_mask(d):
            return live & (jnp.mod(d - y0g, n_shards) <= span)
    # pack ONCE; per-destination compaction then costs one row gather
    # + one bool gather instead of seven per-leaf gathers
    rows_all, valid_all = pack_splats(splats)
    rows_all = rows_all[:, :12]  # drop the 4 spare columns on the wire
    parts, vparts, keeps = [], [], []
    for d in range(n_shards):
        (rows_d, valid_d), kept_d, _ = compact_by_mask(
            (rows_all, valid_all), dest_mask(d), budget
        )
        parts.append(rows_d)
        vparts.append(valid_d)
        keeps.append(kept_d)
    return (
        jnp.stack(parts, axis=0),
        jnp.stack(vparts, axis=0),
        jnp.stack(keeps, axis=0),
    )


def _splats_from_received(rows_rx, valid_rx):
    """Receive side of exchange mode: packed 12-col rows -> ProjectedSplats."""
    rows_rx = jnp.concatenate(
        [rows_rx, jnp.zeros(rows_rx.shape[:1] + (4,), rows_rx.dtype)],
        axis=1,
    )
    return unpack_splats(rows_rx, valid_rx)


def _render_band(scene, view, proj, cam_pos, cfg: RenderConfig, rows: int,
                 use_pallas: bool, shard_splats: bool = False,
                 row_stride: int = 1, band_budget_factor: float | None = 2.5,
                 gather_budget_factor: float | None = None,
                 exchange: bool = False, n_shards: int = 1,
                 exchange_budget_factor: float = 3.0,
                 idx=None):
    """Per-device body: render this device's set of tile rows — the
    contiguous band {idx*rows + s} (row_stride == 1) or the INTERLEAVED
    set {idx + s * n_shards} (row_stride == n_shards), which de-skews load
    when scene density is top/bottom-heavy.

    shard_splats=True: ``scene`` arrives sharded over splats; each chip
    projects+culls its N/ndev shard and the compact screen-space splats
    (~1/4 the bytes of raw parameters) are all-gathered over ICI — the
    "frustum-culled splat lists sharded across chips" scheme (SURVEY.md
    §2.4 growth path).  Under grad, the all-gather transposes to a
    reduce-scatter, so parameter gradients come back splat-sharded too.

    exchange=True (requires shard_splats, contiguous bands): instead of
    all-gathering the full projected array, each chip PARTITIONS its local
    frustum survivors by destination tile-row band and an ``all_to_all``
    delivers to every chip exactly the splats touching ITS band.  Both the
    collective bytes AND the downstream binning input are then
    ~N * factor / n_shards per chip — the strong-scaling regime the
    replicated design can't reach (its per-chip O(N) projection/binning
    floor caps 8-chip efficiency, SCALING.json).  Under grad the
    all_to_all transposes to the reverse all_to_all, so parameter
    gradients come back to the owning shard with no extra collective.

    ``idx`` defaults to the mesh axis index (the shard_map path); the
    scaling harness (scripts/scaling.py) passes a concrete shard index to
    run ONE shard's exact program on a single device and time its work.

    Returns the device's image rows (rows*tile_size, padded_width, 3), in
    local order (de-interleaving is the caller's job when row_stride > 1).
    """
    if idx is None:
        idx = jax.lax.axis_index(TILE_AXIS)
    row0 = jnp.asarray(
        idx * (rows if row_stride == 1 else 1), jnp.int32
    )

    splats = project(scene, view, proj, cam_pos, cfg)
    if shard_splats and exchange:
        stacked, vstacked, kept = _exchange_parts(
            splats, cfg, rows, n_shards, exchange_budget_factor, row_stride
        )

        def a2a(a):
            # (n_shards, budget, ...) -> same shape with axis-0 slice s now
            # holding what chip s sent to THIS chip; flatten to a single
            # received buffer of n_shards * budget candidate splats
            out = jax.lax.all_to_all(
                a, TILE_AXIS, split_axis=0, concat_axis=0, tiled=True
            )
            return out.reshape((-1,) + out.shape[2:])

        splats = _splats_from_received(a2a(stacked), a2a(vstacked) & a2a(kept))
    elif shard_splats:
        if gather_budget_factor is not None:
            # frustum-survivor compaction BEFORE the collective: the
            # all-gather moves ~survivor bytes instead of raw-N bytes
            # (BASELINE north star "frustum-culled splat lists sharded
            # across chips").  Survivors beyond the budget drop (rare;
            # size the factor for the workload's visible fraction).
            n_loc = splats.valid.shape[0]
            budget = _round_budget(
                int(n_loc * gather_budget_factor), n_loc
            )
            splats, kept, _ = compact_splats(splats, splats.valid, budget)
            splats = dataclasses.replace(
                splats, valid=splats.valid & kept
            )
        splats = jax.tree.map(
            lambda a: jax.lax.all_gather(a, TILE_AXIS, axis=0, tiled=True),
            splats,
        )
    if (
        band_budget_factor is not None
        and rows < cfg.tiles_y
        and not exchange
    ):
        # band compaction: keep only splats whose footprint intersects
        # THIS chip's tile rows, so binning's per-splat slot allocation
        # (the O(N) term every chip used to pay in full) scales with the
        # shard's share of the image.  The budget is this shard's
        # proportional share times the safety factor; overfull bands drop
        # trailing splats (use interleaved assignment to keep per-shard
        # density near-uniform).
        n_all = splats.valid.shape[0]
        ty_hi = (
            row0 + rows
            if row_stride == 1
            else row0 + (rows - 1) * row_stride + 1
        )
        _, _, _, _, cnt, _ = binning.tile_bbox(
            splats, cfg, ty_lo=row0, ty_hi=ty_hi, row_stride=row_stride
        )
        frac = min(1.0, rows / cfg.tiles_y * band_budget_factor)
        budget = _round_budget(int(n_all * frac), n_all)
        splats, kept, _ = compact_splats(splats, cnt > 0, budget)
        splats = dataclasses.replace(splats, valid=splats.valid & kept)
    binned = binning.bin_splats(
        splats, cfg, row_offset=row0, local_rows=rows, row_stride=row_stride
    )
    rgb_tiles, trans_tiles = blend_tiles(
        cfg,
        use_pallas,
        rows,
        row_stride,
        binned.table,
        binned.tile_starts,
        binned.tile_counts,
        row0,
    )
    ts = cfg.tile_size
    tx_n = cfg.tiles_x
    img = rgb_tiles.reshape(rows, tx_n, ts, ts, 3)
    img = img.transpose(0, 2, 1, 3, 4).reshape(rows * ts, tx_n * ts, 3)
    trans = trans_tiles.reshape(rows, tx_n, ts, ts)
    trans = trans.transpose(0, 2, 1, 3).reshape(rows * ts, tx_n * ts)
    img = img + cfg.background * trans[..., None]
    return img


def make_sharded_render_fn(mesh, cfg: RenderConfig, use_pallas: bool | None = None,
                           shard_splats: bool = False,
                           interleaved: bool = False,
                           band_budget_factor: float | None = 2.5,
                           gather_budget_factor: float | None = None,
                           exchange: bool = False,
                           exchange_budget_factor: float = 3.0):
    """Build a jit'd sharded render: (scene, view, proj, cam_pos) -> (H, W, 3).

    Camera inputs are replicated; the image is computed with its tile rows
    sharded over the mesh — contiguous bands by default, or round-robin
    rows with interleaved=True (better load balance on scenes whose splat
    density varies by image row: sky rows vs ground rows).  The scene is
    replicated by default; with shard_splats=True it must arrive sharded
    over splats (see shard_scene_splats) and projection/culling are split
    across chips with an ICI all-gather of the compact screen-space
    splats — or, with exchange=True as well, an all_to_all that delivers
    each chip ONLY the splats touching its band (per-chip work AND
    collective bytes ~1/n_shards; the strong-scaling mode).
    Differentiable: reverse-mode inserts the psum (replicated),
    reduce-scatter (all-gather splat sharding), or reverse all_to_all
    (exchange) gradient collective.
    """
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    if exchange and not shard_splats:
        raise ValueError("exchange=True requires shard_splats=True")
    n_shards = mesh.shape[TILE_AXIS]
    rows = _rows_per_shard(cfg, n_shards)
    stride = n_shards if interleaved else 1

    body = functools.partial(
        _render_band, cfg=cfg, rows=rows, use_pallas=use_pallas,
        shard_splats=shard_splats, row_stride=stride,
        band_budget_factor=band_budget_factor,
        gather_budget_factor=gather_budget_factor,
        exchange=exchange, n_shards=n_shards,
        exchange_budget_factor=exchange_budget_factor,
    )

    scene_spec = P(TILE_AXIS) if shard_splats else P()
    sharded = shard_map(
        body,
        mesh=mesh,
        in_specs=(scene_spec, P(), P(), P()),
        out_specs=P(TILE_AXIS, None, None),  # device-major image rows
        check_vma=False,
    )

    ts = cfg.tile_size

    @jax.jit
    def render_fn(scene, view, proj, cam_pos):
        img = sharded(scene, view, proj, cam_pos)
        if interleaved:
            # device-major (n, rows, ts, W, C) -> global row-major: global
            # tile row of (device d, local row s) is d + s * n_shards
            w = img.shape[1]
            img = img.reshape(n_shards, rows, ts, w, 3)
            img = img.transpose(1, 0, 2, 3, 4).reshape(
                n_shards * rows * ts, w, 3
            )
        return img[: cfg.height, : cfg.width]

    return render_fn


def render_sharded(scene: GaussianData, view, proj, cam_pos, cfg: RenderConfig,
                   mesh, use_pallas: bool | None = None):
    """One-shot sharded render (compiles per cfg/mesh — prefer
    make_sharded_render_fn for loops)."""
    fn = make_sharded_render_fn(mesh, cfg, use_pallas)
    return fn(
        scene,
        jnp.asarray(view, jnp.float32),
        jnp.asarray(proj, jnp.float32),
        jnp.asarray(cam_pos, jnp.float32),
    )


def shard_scene_splats(scene, mesh):
    """Place the scene sharded over splats (axis 0) on the mesh; pads to a
    mesh-size multiple first."""
    import numpy as np
    from jax.sharding import NamedSharding

    n_dev = mesh.shape[TILE_AXIS]
    n = len(scene.xyz)
    scene = scene.pad_to(-(-n // n_dev) * n_dev) if n % n_dev else scene
    sharding = NamedSharding(mesh, P(TILE_AXIS))
    return jax.tree.map(lambda a: jax.device_put(jnp.asarray(a), sharding), scene)


def make_sharded_train_step(mesh, cfg: RenderConfig, optimizer=None,
                            use_pallas: bool | None = None,
                            shard_splats: bool = False,
                            interleaved: bool = False,
                            band_budget_factor: float | None = 2.5,
                            gather_budget_factor: float | None = None,
                            exchange: bool = False,
                            exchange_budget_factor: float = 3.0):
    """Full multi-chip training step: L2 loss against a target image,
    gradient all-reduce over the mesh, optax update.

    Returns step(scene, opt_state, view, proj, cam_pos, target) ->
    (scene, opt_state, loss).  This is the flagship train path the driver's
    dryrun_multichip exercises.
    """
    import optax

    if optimizer is None:
        optimizer = optax.adam(1e-3)
    render_fn_inner = make_sharded_render_fn(
        mesh, cfg, use_pallas, shard_splats=shard_splats,
        interleaved=interleaved, band_budget_factor=band_budget_factor,
        gather_budget_factor=gather_budget_factor,
        exchange=exchange, exchange_budget_factor=exchange_budget_factor,
    )

    def loss_fn(scene, view, proj, cam_pos, target):
        img = render_fn_inner(scene, view, proj, cam_pos)
        return jnp.mean((img - target) ** 2)

    @jax.jit
    def step(scene, opt_state, view, proj, cam_pos, target):
        loss, grads = jax.value_and_grad(loss_fn)(
            scene, view, proj, cam_pos, target
        )
        updates, opt_state = optimizer.update(grads, opt_state, scene)
        scene = optax.apply_updates(scene, updates)
        return scene, opt_state, loss

    return step
