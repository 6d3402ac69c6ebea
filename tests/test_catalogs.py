"""Offline tests of the source catalogs (name → URL resolution).

Stub catalogs injected through the ``fetch`` hook — the same test
seam the reference uses (``GeofabrikTest``/``AwsOsmTest``/
``OvertureStacTest`` parse canned payloads).
"""

import json

import pytest

from planetiler_ray.sources.catalogs import (AwsOsmCatalog,
                                             geofabrik_download_url,
                                             overture_parquet_urls)


def _geofabrik_index():
    feats = [
        {"properties": {"id": "monaco", "name": "Monaco",
                        "iso3166-1:alpha2": ["MC"],
                        "urls": {"pbf": "https://x/monaco.osm.pbf"}}},
        {"properties": {"id": "germany", "name": "Germany",
                        "iso3166-1:alpha2": ["DE"],
                        "urls": {"pbf": "https://x/germany.osm.pbf"}}},
        {"properties": {"id": "us/north-carolina",
                        "name": "North Carolina",
                        "iso3166-2": ["US-NC"],
                        "urls": {"pbf": "https://x/nc.osm.pbf"}}},
        {"properties": {"id": "north-america", "name": "North America",
                        "urls": {"pbf": "https://x/na.osm.pbf"}}},
        {"properties": {"id": "no-pbf", "name": "Monaco",
                        "urls": {}}},
    ]
    return json.dumps({"features": feats}).encode()


def _geo_fetch(url):
    return _geofabrik_index()


def test_geofabrik_exact_id_and_iso():
    for q in ("monaco", "Monaco", "MC", "mc"):
        assert geofabrik_download_url(
            q, fetch=_geo_fetch, index_url=f"stub://{q}") \
            == "https://x/monaco.osm.pbf"
    assert geofabrik_download_url(
        "us/north-carolina", fetch=_geo_fetch,
        index_url="stub://nc") == "https://x/nc.osm.pbf"


def test_geofabrik_name_tokens_and_errors():
    # token-set name match (order/punctuation-insensitive)
    assert geofabrik_download_url(
        "carolina north", fetch=_geo_fetch,
        index_url="stub://t1") == "https://x/nc.osm.pbf"
    # subset → approximate tier, single hit
    assert geofabrik_download_url(
        "carolina", fetch=_geo_fetch,
        index_url="stub://t2") == "https://x/nc.osm.pbf"
    # 'north' appears in two names → ambiguous approximate match
    with pytest.raises(ValueError, match="Multiple approximate"):
        geofabrik_download_url("north", fetch=_geo_fetch,
                               index_url="stub://t3")
    with pytest.raises(ValueError, match="No matches"):
        geofabrik_download_url("atlantis", fetch=_geo_fetch,
                               index_url="stub://t4")


def _s3_page(keys, token=None):
    from xml.sax.saxutils import escape
    items = "".join(f"<Contents><Key>{k}</Key></Contents>" for k in keys)
    trunc = ("<IsTruncated>true</IsTruncated>"
             f"<NextContinuationToken>{escape(token)}"
             "</NextContinuationToken>"
             if token else "<IsTruncated>false</IsTruncated>")
    return (f'<?xml version="1.0"?><ListBucketResult '
            f'xmlns="http://s3.amazonaws.com/doc/2006-03-01/">'
            f"{items}{trunc}</ListBucketResult>").encode()


def test_aws_osm_latest_and_snapshot_with_pagination():
    pages = {
        "https://b/?list-type=2": _s3_page(
            ["2024/planet-240101.osm.pbf", "2024/planet-240101.osm.pbf.md5"],
            token="t&1"),
        "https://b/?list-type=2&continuation-token=t%261": _s3_page(
            ["2024/planet-240108.osm.pbf"]),
    }
    cat = AwsOsmCatalog("https://b/")
    assert cat.download_url("latest", fetch=pages.__getitem__) \
        == "https://b/2024/planet-240108.osm.pbf"
    assert cat.download_url("240101", fetch=pages.__getitem__) \
        == "https://b/2024/planet-240101.osm.pbf"
    with pytest.raises(ValueError, match="Unable to find"):
        cat.download_url("999999", fetch=pages.__getitem__)


def test_aws_osm_ambiguous_snapshot():
    cat = AwsOsmCatalog("https://b/")
    page = _s3_page(["a/planet-240101.osm.pbf", "b/planet-240101.osm.pbf"])
    with pytest.raises(ValueError, match="multiple"):
        cat.download_url("240101", fetch=lambda url: page)


def _stac_tree():
    docs = {
        "https://stac/catalog.json": {
            "latest": "2024-07-22.0",
            "links": [{"rel": "child", "href": "./2024-07-22.0/catalog.json",
                       "latest": True}]},
        "https://stac/2024-07-22.0/catalog.json": {
            "links": [{"rel": "child", "href": "./buildings/catalog.json",
                       "title": "Buildings"},
                      {"rel": "child", "href": "./places/catalog.json"}]},
        "https://stac/2024-07-22.0/buildings/catalog.json": {
            "links": [{"rel": "child", "href": "./building/collection.json",
                       "title": "building"}]},
        "https://stac/2024-07-22.0/buildings/building/collection.json": {
            "extent": {"spatial": {"bbox": [[-180, -90, 180, 90]]}},
            "links": [{"rel": "item", "href": "./item0.json"},
                      {"rel": "item", "href": "./item1.json"},
                      {"rel": "item", "href": "./item2.json"}]},
        "https://stac/2024-07-22.0/buildings/building/item0.json": {
            "bbox": [0, 0, 10, 10],
            "assets": {"aws": {"href": "https://aws/part0.parquet"},
                       "azure": {"href": "https://az/part0.parquet"}}},
        "https://stac/2024-07-22.0/buildings/building/item1.json": {
            "bbox": [100, 40, 110, 50],
            "assets": {"azure": {"href": "https://az/part1.parquet"}}},
        "https://stac/2024-07-22.0/buildings/building/item2.json": {
            "bbox": [-20, -20, -1, -1],
            "assets": {}},
    }
    return lambda url: json.dumps(docs[url]).encode()


def test_overture_stac_walk_bbox_and_asset_preference():
    fetch = _stac_tree()
    # world: aws-preferred for item0, azure fallback item1, item2 dropped
    urls = overture_parquet_urls("buildings", "building", None,
                                 catalog_url="https://stac/catalog.json",
                                 fetch=fetch)
    assert urls == ["https://aws/part0.parquet", "https://az/part1.parquet"]
    # bounds touching only item1
    urls = overture_parquet_urls("Buildings", "building", (99, 39, 101, 41),
                                 catalog_url="https://stac/catalog.json",
                                 fetch=fetch)
    assert urls == ["https://az/part1.parquet"]
    # bounds outside the collection extent → handled per-item (extent is
    # world here); unknown theme errors
    with pytest.raises(ValueError, match="theme 'roads' not found"):
        overture_parquet_urls("roads", "road", None,
                              catalog_url="https://stac/catalog.json",
                              fetch=fetch)


def test_overture_collection_extent_short_circuit():
    fetch0 = _stac_tree()

    calls = []

    def fetch(url):
        calls.append(url)
        data = json.loads(fetch0(url).decode())
        if url.endswith("collection.json"):
            data["extent"] = {"spatial": {"bbox": [[0, 0, 10, 10]]}}
        return json.dumps(data).encode()

    urls = overture_parquet_urls("buildings", "building", (50, 50, 60, 60),
                                 catalog_url="https://stac/catalog.json",
                                 fetch=fetch)
    assert urls == []
    # no item documents fetched when the collection extent misses
    assert not any("item" in u for u in calls)


def test_geofabrik_id_beats_name():
    """id tokens resolve in a higher tier than name tokens: id='georgia'
    (country) wins over us/georgia named 'Georgia' instead of raising a
    multiple-exact-ID error (Geofabrik.searchIndexForDownloadUrl)."""
    idx = {"features": [
        {"properties": {"id": "georgia", "name": "Georgia",
                        "urls": {"pbf": "https://x/georgia.pbf"}}},
        {"properties": {"id": "us/georgia", "name": "Georgia",
                        "urls": {"pbf": "https://x/us-georgia.pbf"}}},
    ]}
    fetch = lambda u: json.dumps(idx).encode()  # noqa: E731
    assert geofabrik_download_url(
        "georgia", fetch=fetch,
        index_url="t-id-name-1") == "https://x/georgia.pbf"
    assert geofabrik_download_url(
        "us/georgia", fetch=fetch,
        index_url="t-id-name-2") == "https://x/us-georgia.pbf"
