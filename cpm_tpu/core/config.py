"""Frozen configuration dataclasses.

The reference exposes these as Inviwo properties with onChange-driven
invalidation (processor/progressivephotontracercl.cpp:80-184) and as OpenCL
``-D`` compile defines (photontracercl.cpp:198-210). Here they are static
Python dataclasses: changing one re-specializes the jitted pipeline, the
exact analog of a kernel recompile.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from cpm_tpu.core import constants
from cpm_tpu.ops import phase as phase_mod


@dataclass(frozen=True)
class TracerConfig:
    """Photon-tracing stage configuration.

    Mirrors ProgressivePhotonTracerCL properties
    (progressivephotontracercl.cpp:80-103): max scattering events (1-16),
    sampling rate (-> step size), material phase function, progressive alpha.
    """

    max_interactions: int = 1
    phase_type: int = phase_mod.ISOTROPIC
    phase_g: float = 0.0  # HG anisotropy / Schlick k
    # Clip AABB in texture space: the analog of the clip-plane properties
    # uploaded as the tracer kernel's bounding box
    # (progressivephotontracercl.cpp:674-686) — photons only propagate
    # inside this box.
    clip_min: tuple = (0.0, 0.0, 0.0)
    clip_max: tuple = (1.0, 1.0, 1.0)
    tau_max: float = 1.0  # safety multiplier on the per-cell majorants
    sampling_rate: float = 2.0
    alpha: float = 0.3  # progressive radius alpha (Knaus-Zwicker)
    max_steps: int = 20000  # hard cap on wavefront iterations (safety net)
    no_single_scattering: bool = False  # reference define NO_SINGLE_SCATTERING
    radius_rel: float = constants.DEFAULT_RADIUS_REL
    use_majorant_grid: bool = True  # macrocell empty-space skipping
    # Photon storage dtype: "float32" or the half-precision "float16"
    # (the reference's -D PHOTON_DATA_TYPE half option, photon.cl:49-63)
    # — halves photon-buffer memory and splat/select bandwidth at 4M
    # photons; positions quantize to ~5e-4 of the volume extent.
    photon_dtype: str = "float32"
    # Trace at most this many lanes per wavefront launch (None = all).
    # BASELINE config 5 (4M photons) needs chunking: the monolithic
    # wavefront's temporaries OOM and its compile is prohibitive, while
    # chunks reuse ONE compiled program; results are bit-identical
    # (lane-id-keyed RNG).
    trace_chunk: int | None = None
    majorant_cell_size: int = 8  # voxels per majorant macrocell axis
    # Free flights are clamped at the exit of the (2*ring+1)^3 cell block
    # around the lane's cell; the majorant is dilated to match. Bigger
    # rings trade fewer boundary-clamp null events against looser (more
    # rejected) majorants near density boundaries.
    block_ring: int = 1
    # Max empty-space jump length in macrocells. Bounds the nonlocal data
    # dependence of trajectories (ADVICE round 4): an empty-cell lane's
    # jump reads the capped Chebyshev distance map, so its RNG phase
    # depends only on majorant values within (empty_jump_cap + 1) cells.
    # recompute.exact_coverage dilates the importance grid to match.
    empty_jump_cap: int = 6
    # Voxels per packed-brick axis for the hot-loop volume fetch
    # (ops/sampling.py:pack_bricks). Measured at 128^3/65k photons: scale 2
    # (2^18 rows, 72-wide) 79.6 ms/trace vs scale 4 (2^15 rows, 520-wide)
    # 113 ms — row width traffic beats row-count savings beyond scale 2.
    # Must be <= majorant_cell_size.
    brick_scale: int = 2
    # Staged active-lane compaction (4x shrink per stage); bit-identical
    # results to the single-stage loop because RNG is keyed by
    # (lane_id, global step), not buffer position.
    use_compaction: bool = True
    # Woodcock flight attempts unrolled per while-loop iteration: amortizes
    # the fixed per-iteration dispatch cost. For a FIXED K, results are
    # bit-identical across wavefront widths/chunks (each substep advances
    # the same (lane, step)-keyed RNG counter), but results may DIFFER
    # between K values: the loop condition is only re-evaluated per
    # K-group, so lanes can take up to K-1 extra keyed flights past the
    # max_steps/plateau exit (tracer.py:401). Measured ~5% at 65k/128^3
    # for K=2-4.
    flights_per_iteration: int = 2


@dataclass(frozen=True)
class SplatConfig:
    """Light-volume splatting configuration
    (photontolightvolumeprocessorcl.cpp:144-170)."""

    volume_size_from_radius: bool = True  # ceil(1/r_rel) per axis
    volume_dim: int = 64  # used when volume_size_from_radius is False
    footprint: int = 4  # voxels per axis covered per photon (static)
    incremental_threshold: float = 0.6  # fraction above which a full resplat runs
    # "auto" -> MXU Pallas matmul splat on TPU, XLA matmul twin on CPU;
    # "scatter" -> exact radial-kernel scatter-add (reference parity).
    method: str = "auto"


@dataclass(frozen=True)
class RecomputeConfig:
    """Correlated selective-recomputation configuration
    (progressivephotontracercl.cpp:86-101)."""

    max_photons_fraction: float = 0.1  # "max photons per update %"
    equal_importance: bool = False  # round-robin instead of importance
    equal_importance_percentage: int = 10
    grid_cell_size: int = constants.DEFAULT_GRID_CELL_SIZE
    importance_steps: int = 64  # DDA segment resolution cap
    # "quadrature_mxu" (default): fixed-K midpoint sampling of the
    # importance grid with the lookups recast as one-hot MXU matmuls —
    # identical ranking to "quadrature", ~4 ms vs ~18 ms per correlated
    # frame at 65k photons (the gather path costs ~8.5 ns/lookup on the
    # v5e regardless of table size; round-5 measurement). Auto-falls back
    # to "quadrature" past ~4e9 one-hot elements (static-shape check in
    # ops/path_importance.py — the operand is O(samples x grid cells)).
    # "quadrature": the same midpoint rule via XLA gathers.
    # "dda": exact Amanatides-Woo traversal (reference parity,
    # photonrecomputationdetector.cl:55-90) — guarantees no crossed cell is
    # missed, required for exact drain coverage.
    importance_mode: str = "quadrature_mxu"
    importance_quadrature_samples: int = 8
    # Dilate the importance grid by the tracer's FULL data-influence radius
    # (block_ring + empty_jump_cap + 1) instead of just block_ring, so that
    # any photon whose RNG phase could shift under the edit — including via
    # the capped empty-space distance map — is flagged. Combined with
    # importance_mode="dda" this restores exact drain coverage; the default
    # (False, block_ring only) is a deliberate approximation that keeps
    # selection selective (a full-influence dilation flags most of the grid
    # for small grids). See ops/majorant.py:empty_distance_grid.
    exact_coverage: bool = False


@dataclass(frozen=True)
class RenderConfig:
    """Camera ray-march compositing configuration (LightingRaycaster analog)."""

    width: int = 512
    height: int = 512
    sampling_rate: float = 1.0
    ambient: float = 0.05
    # "sweep" -> shear-warp MXU renderer (ops/sweep_render.py, 12.7 ms per
    # 512^2/128^3 frame on v5e, round-5 chained protocol); "march" ->
    # dense-batch ray marcher (ops/gather.py, gather-bound, ~28 s/frame —
    # oracle/fallback only).
    method: str = "sweep"
    # Intermediate-image oversampling factor for the sweep renderer.
    inter_scale: float = 1.5


@dataclass(frozen=True)
class PipelineConfig:
    tracer: TracerConfig = field(default_factory=TracerConfig)
    splat: SplatConfig = field(default_factory=SplatConfig)
    recompute: RecomputeConfig = field(default_factory=RecomputeConfig)
    render: RenderConfig = field(default_factory=RenderConfig)
    photons_x: int = 256  # photon grid (photons = photons_x * photons_y)
    photons_y: int = 256
    # Importance-map-guided photon emission (BASELINE config 3): warp each
    # directional light's stratified sample grid by the inverse CDF of the
    # importance grid's projection onto the light plane
    # (ops/emit.py:build_emission_guide + ops/sampling.py:warp_samples_2d).
    # Unbiased for any guide (pdf bookkeeping); guide_floor mixes in the
    # uniform density so zero-importance regions keep coverage.
    guided_emission: bool = False
    guide_resolution: int = 64
    guide_floor: float = 0.1
    # "linear" keeps raster sample order; "hilbert" reorders the 2D sample
    # grid along a Hilbert curve (cl/samplegridindex.cl:51-85) so that
    # nearby lane ids emit spatially nearby photons — this is what makes
    # the id-ordered "spatial sort" of the retrace batch
    # (ops/select.py spatial_sort) an actual spatial sort.
    sample_order: str = "linear"
