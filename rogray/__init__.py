"""rogray — a Ray-Data-native overlap-and-gap resolution engine.

A from-scratch rebuild of the capabilities of larsop/resolve-overlap-and-gap
(PL/pgSQL + PostGIS Topology, see /root/reference) on ray.data.Dataset:

- hierarchical quadkey (H3/S2-style) tiling with content-balanced splitting
  (reference: cbg_content_based_balanced_grid, find_overlap_and_gap-pre.sql:121-239)
- per-tile snap-rounded overlay (noding + polygonize + coverage labelling)
  inside stateful map_batches actors (reference: single_cell JT1,
  function_resolve_overlap_gap_single_cell.sql)
- border stitch as a groupby over shared-boundary segments (reference:
  JT2..JT6 border passes + serial master-topology merge)
- face extraction + >50%-coverage attribute join (reference: JT7,
  function_resolve_overlap_gap_single_cell.sql:833-873)

All geometry runs on an integer snap grid with exact arithmetic so that the
tiles sharing a border compute bit-identical coordinates — the property the
reference gets from a single shared PostGIS topology.
"""

__version__ = "0.1.0"
