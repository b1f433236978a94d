"""DiffDope orchestrator — the user-facing refinement object.

Reference: the `DiffDope` dataclass (diffdope/diffdope.py:1267-1725).  Same
surface: construct from a config (`DiffDope(cfg=cfg)`), `run_optimization()`,
`get_argmin()`, `get_pose()`, `render_img()`, `make_animation()`,
`plot_losses()`, `add_loss_value()`, `set_batchsize()`.

TPU-native architecture (functional core / object shell):

* the optimization is one jitted `lax.scan` (optimize.refine) — the
  reference's 61 host-driven steps with per-step device->CPU render copies
  (diffdope.py:1698-1703) become zero host round trips;
* `optimization_results` is a lazy view (`RenderHistory`) that re-renders
  any requested step from the tiny stored pose trajectory instead of
  holding ~GBs of per-step images — same indexing contract
  (`results[i]['rgb'|'depth'|'mask'|'mtx']`);
* images/meshes are never stacked per hypothesis; the batch axis exists
  only on the 7 pose scalars and the rendered outputs, and can be sharded
  across chips (parallel.py).
"""

from __future__ import annotations

import logging
import time
from functools import partial
from typing import Callable, Dict, List, Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp

from diffdope_tpu.camera import Camera
from diffdope_tpu.config import ConfigNode
from diffdope_tpu.image import Scene
from diffdope_tpu.losses import select_losses
from diffdope_tpu.object3d import Object3D
from diffdope_tpu.optimize import (
    argmin_hypothesis,
    draw_learning_rates,
    refine,
    refine_segmented,
)
from diffdope_tpu.render.pipeline import render_batch
from diffdope_tpu import viz

log = logging.getLogger(__name__)


class RenderHistory:
    """Lazy per-step render access over the stored pose trajectory.

    Mirrors the reference's `optimization_results` list of dicts
    (diffdope.py:1698-1703) without materializing every frame: renders are
    produced on demand from `mtx_history[i]` and memoized.
    """

    def __init__(self, ddope: "DiffDope"):
        self._dd = ddope
        self._cache: Dict[int, dict] = {}

    def __len__(self) -> int:
        h = self._dd.mtx_history
        return 0 if h is None else h.shape[0]

    def __getitem__(self, index: int) -> dict:
        n = len(self)
        if index < 0:
            index += n
        if not 0 <= index < n:
            raise IndexError(index)
        if index not in self._cache:
            mtx = jnp.asarray(self._dd.mtx_history[index])
            renders = self._dd._render(mtx)
            entry = {
                "rgb": np.asarray(renders["rgb"]),
                "depth": np.asarray(renders["depth"]),
                "mask": np.asarray(renders["mask"]),
                "mtx": np.asarray(self._dd.mtx_history[index]),
            }
            if len(self._cache) > 8:  # bound memory
                self._cache.pop(next(iter(self._cache)))
            self._cache[index] = entry
        return self._cache[index]


class DiffDope:
    """Differentiable pose refinement session (reference diffdope.py:1267-).

    Args:
        cfg: ConfigNode (see configs/diffdope.yaml); groups `camera`,
            `object3d`, `scene`, `losses`, `hyperparameters`, and the
            TPU-specific `tpu` group.
        camera / object3d / scene: optional pre-built components (the BOP
            sweep swaps these in place, reference run_bop_scene.py:82-83).
    """

    def __init__(
        self,
        cfg: Optional[ConfigNode] = None,
        camera: Optional[Camera] = None,
        object3d: Optional[Object3D] = None,
        scene: Optional[Scene] = None,
        batchsize: Optional[int] = None,
    ):
        self.cfg = cfg if cfg is not None else ConfigNode()
        tpu_cfg = self.cfg.get("tpu", ConfigNode())
        self.seed = int(tpu_cfg.get("seed", 0))
        self.optimizer_name = str(tpu_cfg.get("optimizer", "sgd"))
        self.raster_impl = str(tpu_cfg.get("raster_impl", "auto"))
        self.tile_hw = (int(tpu_cfg.get("tile_h", 32)), int(tpu_cfg.get("tile_w", 128)))
        mk = tpu_cfg.get("max_tris_per_tile", "auto")
        self.max_tris_per_tile = mk if mk == "auto" else int(mk)

        self.camera = camera if camera is not None else Camera(**self.cfg.camera)
        self.object3d = (
            object3d if object3d is not None else Object3D(**self.cfg.object3d)
        )
        self.scene = scene if scene is not None else Scene(**self.cfg.scene)

        hp = self.cfg.get("hyperparameters", ConfigNode())
        self.batchsize = int(batchsize or hp.get("batchsize", 16))
        self.nb_iterations = int(hp.get("nb_iterations", 60))
        self.base_lr = float(hp.get("base_lr", 20.0))
        self.lr_decay = float(hp.get("lr_decay", 0.1))
        self.learning_rates_bound = list(hp.get("learning_rates_bound", [0.01, 100]))

        self.resolution = self.scene.get_resolution()  # [H, W]
        self.loss_functions, self.loss_weights = select_losses(
            self.cfg.get("losses", ConfigNode({"l1_mask": True}))
        )

        # host-side state
        self.mtx_history: Optional[np.ndarray] = None
        self.losses_values: Dict[str, np.ndarray] = {}
        self.optimization_results = RenderHistory(self)
        self._render_jit = None
        self._refine_jit = None
        self.last_run_stats: Dict[str, float] = {}

        self.set_batchsize(self.batchsize)
        log.info("batchsize is %d", self.batchsize)
        log.info("%s", self.object3d)

    # ------------------------------------------------------------------ #
    # configuration
    # ------------------------------------------------------------------ #
    def set_batchsize(self, batchsize: int) -> None:
        """Set the pose-hypothesis count and redraw the per-hypothesis loss
        scales (seeded PRNG — fixes the reference's unseeded TODO,
        diffdope.py:1367-1375)."""
        self.batchsize = int(batchsize)
        self.object3d.set_batchsize(self.batchsize)
        self.learning_rates = draw_learning_rates(
            jax.random.PRNGKey(self.seed), self.batchsize, self.learning_rates_bound
        )
        self._refine_jit = None  # shape changed; retrace

    def set_object3d(self, object3d: Object3D) -> None:
        """Swap the optimized object in place (the reference's BOP flow,
        run_bop_scene.py:82-83) and drop every cached jitted closure."""
        self.object3d = object3d
        self.object3d.set_batchsize(self.batchsize)
        self._render_jit = None
        self._refine_jit = None

    def set_scene(self, scene: Scene) -> None:
        """Swap the ground-truth scene in place and drop cached closures
        (resolution or gt tensors may have changed)."""
        self.scene = scene
        self.resolution = self.scene.get_resolution()
        self._render_jit = None
        self._refine_jit = None

    def add_loss_function(self, fn: Callable) -> None:
        """Append a custom loss with the functional signature
        ``fn(renders, gt, learning_rates, weights) -> (scalar, (key, (B,)))``
        (replaces the reference's DiffDope-mutating user losses,
        diffdope.py:1283)."""
        self.loss_functions = list(self.loss_functions) + [fn]
        self._refine_jit = None

    @property
    def gt_tensors(self) -> Dict[str, np.ndarray]:
        """Ground-truth arrays {'rgb','depth','segmentation'} (unbatched)."""
        return self.scene.gt_arrays()

    # ------------------------------------------------------------------ #
    # render closure
    # ------------------------------------------------------------------ #
    def _mesh_arrays(self) -> dict:
        # HOST (numpy) arrays on purpose: these become jit CLOSURE
        # constants, and lowering a device-resident constant fetches its
        # value back to host to embed it in the program — on a remote
        # backend (axon tunnel) the first such device->host read can cost
        # minutes (measured 15-207s channel init; docs/ROADMAP.md).
        # Host constants embed directly with no round trip.
        mesh = self.object3d.mesh
        if mesh is None:
            raise ValueError("Object3D has no mesh attached")
        out = {
            "pos": np.asarray(mesh.pos),
            "pos_idx": np.asarray(mesh.pos_idx),
            "edge_adj": np.asarray(mesh.edge_adj) if mesh.edge_adj is not None else None,
        }
        texture_mode = str(self.cfg.get("tpu", ConfigNode()).get("texture_mode", "baked"))
        if mesh.has_textured_map:
            if texture_mode == "baked" and mesh.corner_colors is not None:
                # texture pre-baked to per-corner colors (mesh.py) — zero
                # texture gathers per step on TPU
                out["corner_colors"] = np.asarray(mesh.corner_colors)
            else:
                out.update(
                    uv=np.asarray(mesh.uv),
                    uv_idx=np.asarray(mesh.uv_idx),
                    tex=np.asarray(mesh.tex),
                )
        else:
            out["vtx_color"] = np.asarray(mesh.vtx_color)
        return out

    def _resolve_max_tris(self, arrays, proj, resolution) -> int:
        """'auto' K: measure per-tile counts at the initial poses and pad.

        A fixed K either overflows (dropped triangles -> speckled renders)
        or wastes kernel work; sizing it from the scene once per run keeps
        the bins exact with bounded slack.  1.5x margin covers pose drift
        during the refinement; rebinning happens every step regardless.
        """
        boost = getattr(self, "_capacity_boost", 1.0)
        t_cap = int(arrays["pos_idx"].shape[0])
        if self.max_tris_per_tile != "auto":
            k = int(self.max_tris_per_tile)
            if boost > 1.0:  # overflow auto-recovery grows even explicit K
                k = min(t_cap, -(-int(k * boost) // 128) * 128)
            return k
        from diffdope_tpu.optimize import pose_matrix
        from diffdope_tpu.render.planar import (
            bin_triangles_planar,
            corner_planes,
            packed_planar,
        )

        t_count = int(arrays["pos_idx"].shape[0])

        @jax.jit
        def measure(mtx):
            mvp = jnp.einsum(
                "...ij,...jk->...ik", proj[None], mtx, precision="highest"
            )
            pos_c = arrays["pos"][arrays["pos_idx"].reshape(-1)][None]
            cp = corner_planes(pos_c[0], mvp)
            _, det = packed_planar(cp, None, None, None)
            _, counts, _ = bin_triangles_planar(
                cp, det, resolution, self.tile_hw, t_count
            )
            return counts.max()

        mtx0, _, _ = jax.jit(pose_matrix)(self.object3d.initial_params(1))
        max_count = int(measure(mtx0))
        k = min(
            t_count,
            max(512, -(-int(max_count * 1.5 * boost) // 128) * 128),
        )
        log.info("auto max_tris_per_tile: measured %d -> K=%d", max_count, k)
        return k

    def _resolve_compact_total(self, arrays, proj, resolution, max_tris):
        """Static capacity for the compact bin table (planar.compact_bins).

        Probes the initial pose's per-tile chunk-padded occupancy sum and
        adds 35% slack for pose drift (the uniform-K table pads every tile
        to the WORST tile's occupancy — measured ~6.5x waste at bench
        scale).  tpu.compact_bins=false disables; tpu.compact_total
        overrides the probe."""
        tpu_cfg = self.cfg.get("tpu", ConfigNode())
        if not bool(tpu_cfg.get("compact_bins", True)):
            return None
        override = tpu_cfg.get("compact_total", None)
        if override:
            return int(override)
        if self.raster_impl == "reference":
            return None
        # interpret-mode pallas (CPU) copies the whole resident table per
        # tile instance — the compact layout only pays on real hardware
        if jax.default_backend() not in ("tpu", "axon"):
            return None
        from diffdope_tpu.optimize import pose_matrix
        from diffdope_tpu.render.planar import (
            bin_triangles_planar,
            corner_planes,
            packed_planar,
        )
        from diffdope_tpu.render.raster_v2 import _pick_chunk

        kc = _pick_chunk(max_tris)

        @jax.jit
        def measure(mtx):
            mvp = jnp.einsum(
                "...ij,...jk->...ik", proj[None], mtx, precision="highest"
            )
            pos_c = arrays["pos"][arrays["pos_idx"].reshape(-1)][None]
            cp = corner_planes(pos_c[0], mvp)
            _, det = packed_planar(cp, None, None, None)
            _, counts, _ = bin_triangles_planar(
                cp, det, resolution, self.tile_hw, max_tris
            )
            return jnp.sum(-(-counts // kc) * kc)

        mtx0, _, _ = jax.jit(pose_matrix)(self.object3d.initial_params(1))
        tot0 = int(measure(mtx0))
        boost = getattr(self, "_capacity_boost", 1.0)
        total = -(-int(tot0 * 1.35 * boost + kc) // kc) * kc
        log.info("compact bin table: probe %d slots -> capacity %d", tot0, total)
        return total

    def _resolve_cull(self) -> bool:
        """tpu.cull_backfaces: auto | true | false (default auto).

        auto enables backface culling only when the mesh is closed and
        consistently orientable (mesh.orient_faces_consistently) — the
        meshes for which the depth winner along any ray is the entering,
        front-facing crossing, so culling preserves the rendered image
        except at numerically-degenerate grazing pixels (silhouette pixels
        whose front face is near edge-on: the unculled winner there already
        depends on fp rounding of a ~0 determinant; measured 0.25% of
        foreground pixels on a dense 20480-tri sphere, 0 on coarser
        meshes).  Open scan meshes (e.g. the reference example's
        AlphabetSoup: 57 components, 2548 boundary edges, overlapping
        double-layered patches) keep the reference's no-culling nvdiffrast
        semantics (diffdope.py:198-200); forcing `true` there is a measured
        approximation (tools/cull_ab.py).  Culling roughly halves per-tile
        bin occupancy, which every raster kernel cost scales with.
        """
        val = self.cfg.get("tpu", ConfigNode()).get("cull_backfaces", "auto")
        if isinstance(val, bool):
            return val
        sval = str(val).lower()
        if sval in ("true", "1", "on"):
            return True
        if sval in ("false", "0", "off"):
            return False
        mesh = self.object3d.mesh
        return bool(getattr(mesh, "is_closed", False)
                    and getattr(mesh, "is_oriented", False))

    def _precompute_bins(self, arrays, proj, resolution, max_tris):
        """Bins at the initial poses, widened by tpu.bin_margin_px — shared
        by the unfused (render_fn) and fused loss paths when
        tpu.precompute_bins is set (removes the per-step re-binning)."""
        from diffdope_tpu.optimize import pose_matrix
        from diffdope_tpu.render.pipeline import precompute_bins

        params0 = self.object3d.initial_params(self.batchsize)
        mtx0, _, _ = jax.jit(pose_matrix)(params0)
        margin = float(self.cfg.get("tpu", ConfigNode()).get("bin_margin_px", 24.0))
        return jax.jit(
            lambda m: precompute_bins(
                proj, m, arrays["pos"], arrays["pos_idx"], resolution,
                self.tile_hw, max_tris, margin,
            )
        )(mtx0)

    def _make_render_fn(self, layout: str = "channels", with_bins: bool = False):
        arrays = self._mesh_arrays()
        proj = np.asarray(self.camera.cam_proj, np.float32)
        resolution = tuple(self.resolution)
        max_tris = self._resolve_max_tris(arrays, proj, resolution)

        bins = None
        impl = self.raster_impl
        if impl == "auto":
            impl = "reference" if arrays["pos_idx"].shape[0] <= 256 else "pallas"
        if with_bins and impl == "pallas":
            bins = self._precompute_bins(arrays, proj, resolution, max_tris)
        compact_total = (
            self._resolve_compact_total(arrays, proj, resolution, max_tris)
            if impl == "pallas" else None
        )
        cull = self._resolve_cull()

        def render_fn(mtx, tex=None, vtx_color=None, corner_colors=None):
            kw = dict(arrays)
            if tex is not None:
                kw["tex"] = tex
                # a traced texture must actually be sampled: render_batch
                # prefers baked corner colors when both are present
                kw.pop("corner_colors", None)
            if vtx_color is not None:
                kw["vtx_color"] = vtx_color
            if corner_colors is not None:
                kw["corner_colors"] = corner_colors
            return render_batch(
                proj,
                mtx,
                resolution=resolution,
                raster_impl=self.raster_impl,
                tile_hw=self.tile_hw,
                max_tris_per_tile=max_tris,
                layout=layout,
                bins=bins,
                compact_total=compact_total,
                cull_backfaces=cull,
                **kw,
            )

        return render_fn

    def _render(self, mtx):
        if self._render_jit is None:
            self._render_jit = jax.jit(self._make_render_fn(layout="stacked"))
        return self._render_jit(mtx)

    def _make_fused_loss_fn(self, gt, use_bins: bool = False):
        """Fused render+loss kernel closure when the configuration allows it
        (pallas raster, per-corner colors, standard reference losses only) —
        pipeline.make_fused_loss; None means the unfused path must run.
        ``use_bins`` threads tpu.precompute_bins through to the kernel (the
        fused path otherwise re-bins every step)."""
        from diffdope_tpu.losses import LOSS_REGISTRY
        from diffdope_tpu.render.pipeline import make_fused_loss

        if bool(self.cfg.get("tpu", ConfigNode()).get("fused_loss", True)) is False:
            return None
        fns = set(self.loss_functions)
        std = {
            LOSS_REGISTRY["l1_rgb_with_mask"],
            LOSS_REGISTRY["l1_depth_with_mask"],
            LOSS_REGISTRY["l1_mask"],
        }
        if not fns or not fns <= std:
            return None  # custom losses need the rendered images
        use_rgb = LOSS_REGISTRY["l1_rgb_with_mask"] in fns
        use_depth = LOSS_REGISTRY["l1_depth_with_mask"] in fns
        use_mask = LOSS_REGISTRY["l1_mask"] in fns
        if "segmentation" not in gt or (use_depth and "depth" not in gt):
            return None

        arrays = self._mesh_arrays()
        if (
            arrays.get("corner_colors") is None
            and arrays.get("vtx_color") is None
            and arrays.get("tex") is None
        ):
            return None
        impl = self.raster_impl
        if impl == "auto":
            impl = "reference" if arrays["pos_idx"].shape[0] <= 256 else "pallas"
        if impl != "pallas":
            return None

        proj = np.asarray(self.camera.cam_proj, np.float32)
        resolution = tuple(self.resolution)
        max_tris = self._resolve_max_tris(arrays, proj, resolution)
        bins = (
            self._precompute_bins(arrays, proj, resolution, max_tris)
            if use_bins else None
        )
        return make_fused_loss(
            proj, arrays["pos"], arrays["pos_idx"], resolution, gt,
            self.learning_rates, self.loss_weights,
            use_rgb=use_rgb, use_depth=use_depth, use_mask=use_mask,
            edge_adj=arrays.get("edge_adj"),
            corner_colors=arrays.get("corner_colors"),
            vtx_color=arrays.get("vtx_color"),
            tex=arrays.get("tex"), uv=arrays.get("uv"),
            uv_idx=arrays.get("uv_idx"),
            tile_hw=self.tile_hw, max_tris_per_tile=max_tris, bins=bins,
            cull_backfaces=self._resolve_cull(),
            compact_total=self._resolve_compact_total(
                arrays, proj, resolution, max_tris
            ),
            roi_crop=(
                "off"
                if getattr(self, "_crop_disable", False)
                or str(self.cfg.get_dotted("tpu.roi_crop", "auto")) == "off"
                else "auto"
            ),
        )

    # ------------------------------------------------------------------ #
    # optimization
    # ------------------------------------------------------------------ #
    def run_optimization(self) -> None:
        """Run the full refinement (one compiled scan on device).

        Reference flow: diffdope.py:1634-1714.  Populates `losses_values`,
        `mtx_history`, and the lazy `optimization_results`.
        """
        gt = {k: jnp.asarray(v) for k, v in self.gt_tensors.items()}
        use_bins = bool(self.cfg.get("tpu", ConfigNode()).get("precompute_bins", False))
        render_fn = self._make_render_fn(with_bins=use_bins)
        params0 = self.object3d.initial_params(self.batchsize)

        # seeded per-hypothesis init jitter (optimize.jitter_pose_params):
        # a basin-search capability the reference lacks (its hypotheses all
        # start at the same pose, diffdope.py:1019-1026); defaults of 0
        # keep exact reference behavior
        tpu_cfg = self.cfg.get("tpu", ConfigNode())
        jd = float(tpu_cfg.get("init_jitter_deg", 0.0))
        jt = float(tpu_cfg.get("init_jitter_trans", 0.0))
        if jd > 0.0 or jt > 0.0:
            from diffdope_tpu.optimize import jitter_pose_params

            params0 = jax.jit(
                partial(jitter_pose_params, jitter_deg=jd, jitter_trans=jt)
            )(params0, jax.random.PRNGKey(self.seed + 1))

        # appearance refinement (reference Mesh.enable_gradients_texture,
        # diffdope.py:909-920): lift the color leaves into the optimized
        # parameter pytree
        extra_params = None
        mesh = self.object3d.mesh
        if getattr(mesh, "optimize_appearance", False):
            if mesh.tex is not None and self.cfg.get(
                "tpu", ConfigNode()
            ).get("texture_mode", "baked") == "exact":
                # the reference's actual appearance target: the texture
                # map itself (Mesh.enable_gradients_texture, reference
                # diffdope.py:909-920 + the dr.texture gradient path).
                # Requires the exact per-pixel sampling path — the baked
                # path differentiates corner colors instead (below).
                extra_params = {"tex": jnp.asarray(mesh.tex)}
            elif mesh.corner_colors is not None:
                extra_params = {"corner_colors": jnp.asarray(mesh.corner_colors)}
            elif mesh.vtx_color is not None:
                extra_params = {"vtx_color": jnp.asarray(mesh.vtx_color)}

        def _dispatch(render_fn):
            # fused shade+AA+loss kernel when the configuration allows it
            # (the production fast path; appearance optimization needs the
            # unfused render for its texture gradients)
            fused_fn = (
                None if extra_params is not None
                else self._make_fused_loss_fn(gt, use_bins=use_bins)
            )

            # rebuilt every run: the render closure bakes in the per-run
            # binning (XLA's compile cache absorbs unchanged retraces).
            # Execution is segmented: some environments kill single device
            # programs past ~60s.
            segment = int(tpu_cfg.get("scan_segment", 40))

            # tpu.live_loss='step': per-STEP live loss from inside the
            # compiled scan (jax.debug.callback) — the reference's tqdm
            # granularity (diffdope.py:1654).  Each firing is a
            # device->host round trip, so the default stays the free
            # per-segment report below.
            step_cb = None
            if str(tpu_cfg.get("live_loss", "segment")) == "step":
                self._live_base = 0

                def step_cb(i, total, _self=self):
                    log.info(
                        "step %d/%d loss %.5f",
                        _self._live_base + int(i) + 1,
                        _self.nb_iterations + 1,
                        float(total),
                    )

            self._refine_jit = jax.jit(
                partial(
                    refine,
                    render_fn=render_fn,
                    loss_fns=tuple(self.loss_functions),
                    weights=self.loss_weights,
                    nb_iterations=self.nb_iterations,
                    base_lr=self.base_lr,
                    lr_decay=self.lr_decay,
                    optimizer=self.optimizer_name,
                    fused_loss_fn=fused_fn,
                    step_callback=step_cb,
                ),
                static_argnames=("num_steps",),
            )

            t0 = time.perf_counter()
            if mesh_axis > 1:
                # shard the hypothesis batch over the first `mesh_axis`
                # devices (jax.shard_map, parallel.refine_sharded)
                from diffdope_tpu.parallel import hypothesis_mesh, refine_sharded

                result = refine_sharded(
                    params0, render_fn, tuple(self.loss_functions), gt,
                    self.learning_rates, self.loss_weights,
                    mesh=hypothesis_mesh(mesh_axis),
                    extra_params=extra_params,
                    nb_iterations=self.nb_iterations, base_lr=self.base_lr,
                    lr_decay=self.lr_decay, optimizer=self.optimizer_name,
                    fused_loss_fn=fused_fn,
                )
            elif extra_params is not None:
                result = self._refine_jit(
                    params0, gt=gt, learning_rates=self.learning_rates,
                    extra_params=extra_params,
                )
            elif int(tpu_cfg.get("restarts", 0)) > 0:
                # basin-hopping restarts (optimize.refine_with_restarts):
                # all hypotheses re-seed at the running argmin between
                # segments
                from diffdope_tpu.optimize import refine_with_restarts

                result = refine_with_restarts(
                    params0, render_fn, tuple(self.loss_functions), gt,
                    self.learning_rates, self.loss_weights,
                    nb_iterations=self.nb_iterations,
                    restarts=int(tpu_cfg.get("restarts", 0)),
                    restart_jitter_deg=float(
                        tpu_cfg.get("restart_jitter_deg", 10.0)
                    ),
                    restart_jitter_trans=float(
                        tpu_cfg.get("restart_jitter_trans", 0.02)
                    ),
                    key=jax.random.PRNGKey(self.seed + 2),
                    jit_refine=self._refine_jit,
                    # restart segments obey the same per-dispatch step cap
                    # as the plain path (single executions are killed past
                    # ~60s in some environments)
                    segment_steps=segment,
                )
            else:
                # live per-segment loss (the reference user sees a tqdm
                # loss bar every step, diffdope.py:1654; the one-scan
                # design reports at segment granularity)
                show_progress = bool(tpu_cfg.get("progress", True))

                def _progress(done, total_steps, last_loss):
                    # keeps the per-step callback's indices global across
                    # segments (the scan's step_idx restarts per segment)
                    self._live_base = done
                    if step_cb is None:
                        log.info(
                            "refine %d/%d steps, loss %.5f",
                            done, total_steps, last_loss,
                        )

                result = refine_segmented(
                    params0, render_fn, tuple(self.loss_functions), gt,
                    self.learning_rates, self.loss_weights,
                    nb_iterations=self.nb_iterations, segment_steps=segment,
                    jit_refine=self._refine_jit,
                    # step_cb needs _progress for its cross-segment offset
                    progress_fn=(
                        _progress if (show_progress or step_cb is not None)
                        else None
                    ),
                )
            jax.block_until_ready(result.mtx_history)
            return result, time.perf_counter() - t0

        mesh_axis = int(tpu_cfg.get("mesh_axis", 1))

        # Bin-overflow AUTO-RECOVERY: capacities are probed at the initial
        # pose; a refinement that drifts past them silently degrades that
        # step's renders/gradients.  nvdiffrast has no capacity cap at all
        # (reference diffdope.py:198-200), so parity requires the cap to
        # never cost correctness: on scan-carried overflow telemetry, grow
        # the capacity margin and re-run from the SAME init (the degraded
        # run is discarded).  tpu.overflow_recovery=false restores
        # warn-only behavior.
        recovery = bool(tpu_cfg.get("overflow_recovery", True))
        max_retries = int(tpu_cfg.get("overflow_retries", 2))
        for attempt in range(max_retries + 1):
            result, dt = _dispatch(render_fn)
            overflow = self._overflow_max(result)
            leak = self._telemetry_max(result, "_crop_leak")
            if (
                (overflow == 0 and leak == 0)
                or not recovery
                or attempt == max_retries
            ):
                break
            if overflow > 0:
                self._capacity_boost = (
                    getattr(self, "_capacity_boost", 1.0) * 1.5
                )
                log.warning(
                    "bin overflow mid-refinement (up to %d dropped (tile, "
                    "triangle) pairs/step) — growing bin capacity x%.2f and "
                    "re-running (attempt %d/%d)",
                    overflow, self._capacity_boost, attempt + 1, max_retries,
                )
            if leak > 0:
                # renders drifted past the ROI crop's exactness margin
                # (pipeline.make_fused_loss): the cropped loss may have
                # dropped silhouette pixels — re-run full-frame
                self._crop_disable = True
                log.warning(
                    "ROI crop leak mid-refinement (up to %d triangles/step "
                    "outside the crop interior) — disabling the crop and "
                    "re-running (attempt %d/%d)",
                    leak, attempt + 1, max_retries,
                )
            render_fn = self._make_render_fn(with_bins=use_bins)

        # appearance refinement updates the mesh in place (the reference's
        # nn.Parameter texture is mutated by the optimizer the same way,
        # diffdope.py:909-920), so subsequent renders/history use the
        # refined colors
        if extra_params is not None:
            if "tex" in result.params:
                mesh.tex = np.asarray(result.params["tex"])
            if "corner_colors" in result.params:
                mesh.corner_colors = np.asarray(result.params["corner_colors"])
            if "vtx_color" in result.params:
                mesh.vtx_color = np.asarray(result.params["vtx_color"])
            self._render_jit = None

        self._check_bin_overflow(result)
        self._result = result
        self.mtx_history = np.asarray(result.mtx_history)
        self.losses_values = {k: np.asarray(v) for k, v in result.losses_values.items()}
        self.optimization_results = RenderHistory(self)
        steps = self.nb_iterations + 1
        # Split trace+compile from steady-state throughput: the fastest
        # dispatched segment is compile-free, so its rate is the steady rate
        # and the residual of the total wall is (re)compilation.  A
        # single-segment run can't be split (compile_s/steady stay None).
        compile_s = steady_sps = None
        seg = getattr(result, "segment_times", None)
        if seg and len(seg) > 1:
            steady_sps = max(n / t for n, t in seg)
            compile_s = max(0.0, dt - steps / steady_sps)
        self.last_run_stats = {
            "wall_time_s": dt,
            "steps": steps,
            "steps_per_sec": steps / dt,
            "compile_s": compile_s,
            "steady_steps_per_sec": steady_sps,
            "final_loss": float(np.asarray(result.total_loss)[-1]),
        }
        log.info(
            "refined %d hypotheses, %d steps in %.3fs (%.1f steps/s), final loss %.5f",
            self.batchsize, steps, dt, steps / dt, self.last_run_stats["final_loss"],
        )

    def _overflow_max(self, result) -> int:
        """Worst per-step dropped-pair count from the scan telemetry (0
        when the run produced no overflow telemetry)."""
        return self._telemetry_max(result, "_bin_overflow")

    def _telemetry_max(self, result, key: str) -> int:
        """Worst per-step value of a scan-telemetry counter (0 if the run
        produced no such telemetry)."""
        telem = getattr(result, "telemetry", None) or {}
        if key not in telem:
            return 0
        return int(np.asarray(telem[key]).max(initial=0))

    def _check_bin_overflow(self, result) -> None:
        """Warn when the refinement drifted past the sized bin capacity.

        Per-tile bins are sized at the initial poses (auto: measured x1.5);
        if the poses moved enough that a tile's triangle count exceeds the
        capacity, (tile, triangle) pairs were silently dropped — holes in
        coverage and missing gradients.  Preferred signal: the scan-carried
        per-step overflow telemetry (catches mid-trajectory excursions, e.g.
        an object swinging toward the camera and back).  Fallback when the
        run produced no telemetry (precomputed bins): one eager re-binning
        at the final poses."""
        telem = getattr(result, "telemetry", None) or {}
        if "_crop_leak" in telem:
            lk = np.asarray(telem["_crop_leak"])
            if int(lk.max(initial=0)) > 0:
                log.warning(
                    "ROI crop leak during refinement: up to %d triangles/"
                    "step outside the crop interior (%d steps affected) — "
                    "the cropped loss may differ from full-frame on those "
                    "steps; raise DD_CROP_MARGIN or set tpu.roi_crop=off",
                    int(lk.max()), int((lk > 0).sum()),
                )
        if "_bin_overflow" in telem:
            ov_steps = np.asarray(telem["_bin_overflow"])
            if int(ov_steps.max(initial=0)) > 0:
                worst = int(ov_steps.argmax())
                log.warning(
                    "bin overflow during refinement: up to %d (tile, triangle) "
                    "pairs dropped per step (worst at step %d/%d; %d steps "
                    "affected) — renders/gradients degraded on those steps; "
                    "raise tpu.max_tris_per_tile",
                    int(ov_steps.max()), worst, len(ov_steps),
                    int((ov_steps > 0).sum()),
                )
            return
        try:
            arrays = self._mesh_arrays()
            if arrays["pos_idx"].shape[0] <= 256 or self.raster_impl == "reference":
                return
            from diffdope_tpu.render.planar import (
                bin_triangles_planar, corner_planes, packed_planar,
            )

            proj = np.asarray(self.camera.cam_proj, np.float32)
            resolution = tuple(self.resolution)
            max_tris = self._resolve_max_tris(arrays, proj, resolution)

            @jax.jit
            def measure(mtx):
                mvp = jnp.einsum(
                    "...ij,...jk->...ik", proj[None], mtx, precision="highest"
                )
                pos_c = arrays["pos"][arrays["pos_idx"].reshape(-1)][None]
                cp = corner_planes(pos_c, mvp)
                _, det = packed_planar(cp, None, None, None)
                _, counts, overflow = bin_triangles_planar(
                    cp, det, resolution, self.tile_hw, max_tris
                )
                return overflow, counts.max()

            ov, cmax = jax.device_get(measure(result.mtx_history[-1]))
            if int(ov) > 0:
                log.warning(
                    "bin overflow at the final poses: %d (tile, triangle) "
                    "pairs beyond max_tris_per_tile=%d (max tile count %d) — "
                    "renders/gradients degraded; raise tpu.max_tris_per_tile",
                    int(ov), max_tris, int(cmax),
                )
        except Exception:  # diagnostics must never break a refinement
            log.debug("bin-overflow check skipped", exc_info=True)

    @property
    def renders(self) -> dict:
        """Final-step renders (lazy; reference stores `self.renders` during
        the loop, diffdope.py:1676-1697)."""
        return self.optimization_results[-1]

    def add_loss_value(self, key: str, values) -> None:
        """Append per-hypothesis values to the logged loss curves (reference
        diffdope.py:1554-1571) — for host-side custom metrics."""
        values = np.asarray(values)[None]
        if key not in self.losses_values:
            self.losses_values[key] = values
        else:
            self.losses_values[key] = np.concatenate(
                [self.losses_values[key], values], axis=0
            )

    # ------------------------------------------------------------------ #
    # results
    # ------------------------------------------------------------------ #
    def _best_indices(self) -> tuple:
        """(step, hypothesis) of the selected pose under ``tpu.argmin_rule``.

        Default 'best_step': argmin over the full (step, hypothesis) loss
        history — the best pose the optimizer ever visited, never worse
        (in logged loss) than the init because step 0 scores the init pose.
        'last_step' restores the reference's rule exactly (get_argmin,
        reference diffdope.py:1488-1513), which can return a diverged pose
        when the trajectory overshoots late (optimize.argmin_step_hypothesis).
        """
        if not self.losses_values:
            return -1, 0
        rule = str(self.cfg.get_dotted("tpu.argmin_rule", "best_step"))
        from diffdope_tpu.optimize import argmin_step_hypothesis

        s, b = argmin_step_hypothesis(
            {k: jnp.asarray(v) for k, v in self.losses_values.items()}, rule
        )
        return int(s), int(b)

    def get_argmin(self) -> int:
        """Best hypothesis index (reference diffdope.py:1488-1513; under
        the default tpu.argmin_rule='best_step' it is the hypothesis of
        the best (step, hypothesis) pair — see _best_indices)."""
        return self._best_indices()[1]

    def get_pose(self, batch_index: int = -1) -> np.ndarray:
        """Refined 4x4 pose (OpenGL frame, like the reference's
        diffdope.py:1618-1632).  batch_index=-1 selects the argmin — at
        the best step under tpu.argmin_rule='best_step' (default), at the
        last step under 'last_step' (exact reference rule).  An explicit
        batch_index returns that hypothesis's last-step pose (reference
        behavior)."""
        if batch_index == -1:
            step, hyp = self._best_indices()
            return self.mtx_history[step][hyp]
        return self.mtx_history[-1][batch_index]

    def get_pose_opencv(self, batch_index: int = -1) -> np.ndarray:
        """Refined pose converted back to the OpenCV/BOP frame
        (cam_R_m2c/cam_t_m2c) for ADD(-S) evaluation."""
        from diffdope_tpu.geometry import opengl_to_opencv

        return opengl_to_opencv(self.get_pose(batch_index))

    # ------------------------------------------------------------------ #
    # visualization (host-side)
    # ------------------------------------------------------------------ #
    def render_img(
        self,
        index: Optional[int] = None,
        batch_index: Optional[int] = None,
        render_selection: str = "rgb",
    ) -> np.ndarray:
        """Grid/overlay image of one optimization step (reference
        diffdope.py:1377-1486)."""
        index = -1 if index is None else index
        entry = self.optimization_results[index]
        return self._compose_overlay(
            entry[render_selection], batch_index, render_selection
        )

    def _compose_overlay(
        self,
        gu: np.ndarray,
        batch_index: Optional[int],
        render_selection: str,
        final_width: Optional[int] = None,
    ) -> np.ndarray:
        """Crop/overlay/contour compositing of rendered frames `gu`
        ((B, H, W[, C]) numpy) against the scene ground truth."""
        ri = self.cfg.get("render_images", ConfigNode())
        gt_map = {"rgb": "rgb", "depth": "depth", "mask": "segmentation"}
        gt = self.gt_tensors.get(gt_map.get(render_selection, render_selection))

        crop = None
        if ri.get("crop_around_mask", False):
            seg = self.gt_tensors.get("segmentation")
            src = seg if seg is not None else gu[0]
            crop = viz.find_crop(src)

        def prep(arr, batched):
            if arr is None:
                return None
            a = np.asarray(arr)
            if not batched:
                a = np.broadcast_to(a, (gu.shape[0],) + a.shape)
            if a.ndim == 3:
                a = viz.depth_to_rgb(a) if render_selection == "depth" else a[..., None]
            if crop is not None:
                t, l, s = crop
                a = a[:, t : t + s + 1, l : l + s + 1]
            return a

        fg = prep(gu, batched=True)
        bg = prep(gt, batched=False)
        if batch_index is not None:
            fg = fg[batch_index : batch_index + 1]
            bg = bg[batch_index : batch_index + 1] if bg is not None else None

        return viz.make_grid_overlay_batch(
            foreground=fg,
            background=bg,
            alpha=float(ri.get("alpha_overlay", 0.7)),
            row=int(ri.get("nrow", 4)),
            final_width=int(final_width or ri.get("final_width_batch", 2000)),
            add_background=bool(ri.get("add_background", True)),
            add_contour=bool(ri.get("add_countour", True)),
            color_contour=list(ri.get("color_countour", [0.46, 0.73, 0])),
            flip_result=bool(ri.get("flip_result", True)),
        )

    def make_animation(
        self,
        output_file_path: str = "animation.mp4",
        frame_rate: int = 10,
        batch_index: int = -1,
        chunk: int = 16,
        final_width: int = 800,
    ) -> None:
        """Write the optimization as an mp4 (reference diffdope.py:1515-1552).

        Only the selected hypothesis is rendered, `chunk` steps per device
        call (the step axis rides the render's batch axis), and frames are
        composited at `final_width` — seconds instead of minutes at the
        default scale (the reference re-renders the full batch per frame)."""
        if batch_index == -1:
            batch_index = self.get_argmin()
        n = 0 if self.mtx_history is None else self.mtx_history.shape[0]
        if n == 0:
            raise ValueError("run_optimization() before make_animation()")
        poses = np.asarray(self.mtx_history[:, batch_index])  # (S, 4, 4)
        if self._render_jit is None:
            self._render_jit = jax.jit(self._make_render_fn(layout="stacked"))

        def frames():
            for s in range(0, n, chunk):
                mtxs = poses[s : s + chunk]
                pad = chunk - mtxs.shape[0]  # keep shapes static: one trace
                if pad:
                    mtxs = np.concatenate(
                        [mtxs, np.broadcast_to(mtxs[-1:], (pad, 4, 4))]
                    )
                rgb = np.asarray(self._render_jit(jnp.asarray(mtxs))["rgb"])
                for i in range(min(chunk, n - s)):
                    yield self._compose_overlay(
                        rgb[i : i + 1], None, "rgb", final_width=final_width
                    )

        viz.write_animation(frames(), output_file_path, frame_rate)

    def plot_losses(self, batch_index: int = -1) -> Optional[np.ndarray]:
        """Loss-curve plot as an image (reference diffdope.py:1573-1616)."""
        if batch_index == -1:
            batch_index = self.get_argmin()
        return viz.plot_losses_image(self.losses_values, batch_index)

    def cuda(self) -> None:
        """No-op (device placement is jit/sharding-driven)."""
