"""Configuration dataclasses — the engine's user-extension surface.

Mirrors the reference's config structs (types_resolve_overlap.sql:1-142):
``resolve_overlap_data_input_type`` -> InputConfig,
``resolve_overlap_data_topology_type`` -> TopologyConfig,
``resolve_overlap_data_clean_type`` -> CleanConfig,
``resolve_overlap_data_debug_options_type`` -> DebugConfig.
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass(frozen=True)
class InputConfig:
    """Which columns of the document table carry what.

    The engine's mandated input shape (driver input_hint) is a table of
    interleaved text+media documents: (doc_id: string,
    spans: list<struct<kind, text, media_ref, offset>>).  Geometry rides in
    the span with kind == 'geometry' (WKB hex in ``text``); attribute spans
    use kind == 'attr:<name>'.  A plain columnar table (pk + wkb + attrs)
    is also accepted for library use.
    """

    pk_column: str = "doc_id"
    geometry_span_kind: str = "geometry"
    # columnar mode (used when the table is not span-wrapped):
    wkb_column: str = "wkb"
    attr_columns: tuple[str, ...] = ()


@dataclass(frozen=True)
class GridConfig:
    """The global integer snap grid + quadtree tiling frame.

    ``precision`` is the snap tolerance (reference: topology snap_tolerance,
    function_resolve_overlap_gap_init.sql:48): every coordinate is rounded to
    an integer multiple of it, globally, so tiles agree on shared borders.

    The tiling square is [origin, origin + span]^2 with span a power-of-two
    multiple of precision; a cell at level L is span/2^L wide.  This replaces
    the reference's content-balanced grid frame
    (find_overlap_and_gap-pre.sql:121-239).
    """

    origin_x: float
    origin_y: float
    span: float
    precision: float

    @property
    def span_px(self) -> int:
        return int(round(self.span / self.precision))

    def max_level(self) -> int:
        # cells never get smaller than ~64 snap pixels across
        lvl = 0
        w = self.span_px
        while w > 64 and lvl < 29:
            w //= 2
            lvl += 1
        return lvl


@dataclass(frozen=True)
class TopologyConfig:
    """Reference: resolve_overlap_data_topology_type (types.sql:36-48)."""

    snap_tolerance: float = 1e-5
    utm: bool = False  # True: planar metric CRS; False: lon/lat degrees
    max_rows_in_each_cell: int = 5000  # quadtree split threshold (run.sql:23)
    base_level: int = 3  # coarsest tile level considered
    # histogram depth below base_level: deep enough that fine cells are much
    # smaller than the data extent even on the fixed world frame; occupied
    # fine cells are bounded by the row count (pre-aggregated per batch),
    # so depth is cheap.  (At 10^12 rows switch to a two-stage histogram.)
    histogram_extra_levels: int = 12


@dataclass(frozen=True)
class CleanConfig:
    """Reference: resolve_overlap_data_clean_type (types.sql:51-103).

    NB the reference constructor has a field-order quirk at types.sql:95
    (chaikins_nIterations written into chaikins_min_steep_angle_degrees);
    we implement the *intended* semantics and default everything off, which
    matches the regression configs (resolve_overlap_and_gap.sql:25).
    """

    min_area_to_keep: float = 0.0  # faces smaller than this are dissolved
    simplify_tolerance: float = 0.0  # 0 = off
    chaikins_n_iterations: int = 0  # 0 = off
    chaikins_max_length: float = 0.0
    chaikins_min_degrees: float = 30.0
    chaikins_max_degrees: float = 330.0


@dataclass(frozen=True)
class DebugConfig:
    """Reference: resolve_overlap_data_debug_options_type (types.sql:105-142)."""

    validate: bool = False  # run per-tile invariant checks (ValidateTopology analogue)
    keep_intermediate: bool = False


@dataclass(frozen=True)
class ResolveConfig:
    input: InputConfig = field(default_factory=InputConfig)
    topology: TopologyConfig = field(default_factory=TopologyConfig)
    clean: CleanConfig = field(default_factory=CleanConfig)
    debug: DebugConfig = field(default_factory=DebugConfig)
