"""Driver contract for the graft builder (Ray Data target).

The driver's verify calls ``entry()`` as a smoke check (Ray is already
initialised, local mode), runs each ``queries()[name](sf_dir)`` at
sf=0.01 and compares it against the matching ``oracle_sql()[name]`` via
DuckDB (row-count + schema + order-insensitive value-hash →
CORRECTNESS_r{N}.json).

Ray is initialised by the driver BEFORE this module is imported: nothing
here (or in planetiler_ray) calls ``ray.init`` / ``ray.shutdown``.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship pipeline: full tile-pyramid build over the sf0.001-derived
    image table (z0–z8 for the smoke check); returns the tile Dataset."""
    from planetiler_ray.pipelines.tiles import build_pyramid
    from planetiler_ray.sources.images import images_from_documents, sample_image_ids
    from planetiler_ray.stages.render import RenderConfig

    sf_dir = "/root/testdata/sf0.001"
    images = images_from_documents(sf_dir)
    ids = sample_image_ids(sf_dir)
    cfg = RenderConfig(min_zoom=0, max_zoom=8)
    return build_pyramid(images, ids, cfg, num_partitions=16)


def _pyramid_query(sf_dir: str) -> Any:
    """Tile pyramid z0–z10 over the derived image table: per-zoom stats."""
    import numpy as np

    from planetiler_ray.pipelines.tiles import build_pyramid
    from planetiler_ray.sources.images import images_from_documents, sample_image_ids
    from planetiler_ray.stages.render import RenderConfig

    from ray.data.aggregate import Count, Sum

    images = images_from_documents(sf_dir)
    ids = sample_image_ids(sf_dir)
    cfg = RenderConfig(min_zoom=0, max_zoom=10)
    tiles = build_pyramid(images, ids, cfg, num_partitions=32,
                          with_feature_ids=False)
    # aggregate distributed — only the 11-row zoom summary reaches the
    # driver (never the tile payload bytes)
    out = tiles.select_columns(["z", "n_features"]) \
        .groupby("z").aggregate(Count(alias_name="n_tiles"),
                                Sum("n_features", alias_name="n_features")) \
        .to_pandas()
    out["n_features"] = out["n_features"].astype(np.int64)
    out["z"] = out["z"].astype(np.int64)
    return out.sort_values("z").reset_index(drop=True)


def _join_query(sf_dir: str) -> Any:
    """z12 spatial join + kNN captions over the derived image table."""
    from planetiler_ray.pipelines.tiles import spatial_join
    from planetiler_ray.sources.images import images_from_documents, sample_image_ids

    images = images_from_documents(sf_dir)
    ids = sample_image_ids(sf_dir)
    return spatial_join(images, ids, num_partitions=32, zoom=12)


def queries() -> dict[str, Callable[[str], Any]]:
    from planetiler_ray.pipelines.queries import QUERIES
    from planetiler_ray.pipelines.tiles import mvt_tile_summary

    from planetiler_ray.pipelines.tiles import (line_tile_summary,
                                                poly_tile_summary)

    from planetiler_ray.pipelines.queries_osm import QUERIES_OSM

    out = dict(QUERIES)
    out["image_pyramid_stats"] = _pyramid_query
    out["image_spatial_join_z12"] = _join_query
    out["mvt_tiles_z6"] = mvt_tile_summary
    out["line_tiles_z4"] = line_tile_summary
    out["poly_tiles_z5"] = poly_tile_summary
    from planetiler_ray.pipelines.tiles import poly_merge_tile_summary
    out["poly_merge_tiles"] = poly_merge_tile_summary
    from planetiler_ray.pipelines.archive_rt import archive_roundtrip_summary
    out["archive_roundtrip"] = archive_roundtrip_summary
    out.update(QUERIES_OSM)
    return out


def oracle_sql() -> dict[str, str]:
    from planetiler_ray.pipelines.queries import ORACLE_SQL
    from planetiler_ray.pipelines.sqlgen import (sql_image_pyramid_stats,
                                                 sql_image_spatial_join,
                                                 sql_line_tile_summary,
                                                 sql_mvt_tile_summary,
                                                 sql_poly_tile_summary)

    from planetiler_ray.pipelines.sqlgen import (sql_osm_line_tiles,
                                                 sql_osm_multipolygon_stats,
                                                 sql_osm_poi_stats,
                                                 sql_osm_way_stats)

    out = dict(ORACLE_SQL)
    out["image_pyramid_stats"] = sql_image_pyramid_stats()
    out["image_spatial_join_z12"] = sql_image_spatial_join()
    out["mvt_tiles_z6"] = sql_mvt_tile_summary()
    out["line_tiles_z4"] = sql_line_tile_summary()
    out["poly_tiles_z5"] = sql_poly_tile_summary()
    from planetiler_ray.pipelines.sqlgen import sql_poly_merge_tiles
    out["poly_merge_tiles"] = sql_poly_merge_tiles()
    from planetiler_ray.pipelines.sqlgen import sql_archive_roundtrip
    out["archive_roundtrip"] = sql_archive_roundtrip()
    out["osm_way_stats"] = sql_osm_way_stats()
    out["osm_multipolygon_stats"] = sql_osm_multipolygon_stats()
    out["osm_line_tiles"] = sql_osm_line_tiles()
    out["osm_poi_stats"] = sql_osm_poi_stats()
    return out
