"""Source catalogs: name → download-URL resolution.

Re-expressions of the reference's catalog utilities (semantics only):

- :func:`geofabrik_download_url` — search the Geofabrik JSON index for
  a ``.osm.pbf`` by area name/id (``util/Geofabrik.java``): exact id
  tokens beat exact name tokens beat approximate (contains-all) name
  tokens; any tier with more than one hit is an error.
- :class:`AwsOsmCatalog` — page through an S3 ``list-type=2`` bucket
  index and resolve ``latest`` or a snapshot date to a planet pbf URL
  (``util/AwsOsm.java`` incl. the OSM PDS + Overture buckets).
- :func:`overture_parquet_urls` — walk the Overture STAC catalog tree
  (catalog → latest release → theme → type collection → items) and
  return the parquet asset URLs whose item bbox intersects the given
  bounds (``util/OvertureStac.java:90-205``).

Network is gated exactly like ``sources/downloader.py``: every
function takes a ``fetch(url) -> bytes`` callable; the default uses
urllib and is never exercised in the offline sandbox (tests inject
stub catalogs).  Resolved URLs feed :func:`..sources.downloader.download`.
"""

from __future__ import annotations

import json
import re
import xml.etree.ElementTree as ET
from concurrent.futures import ThreadPoolExecutor
from typing import Callable, Iterable
from urllib.parse import quote, urljoin

GEOFABRIK_INDEX_URL = "https://download.geofabrik.de/index-v1-nogeom.json"
OSM_PDS_BUCKET = "https://osm-pds.s3.amazonaws.com/"
OVERTURE_BUCKET = "https://overturemaps-us-west-2.s3.amazonaws.com/"
OVERTURE_STAC_CATALOG = "https://stac.overturemaps.org/catalog.json"


def _default_fetch(url: str) -> bytes:      # pragma: no cover — gated
    import urllib.request
    with urllib.request.urlopen(url, timeout=30) as r:
        return r.read()


# ---------------------------------------------------------------------------
# Geofabrik
# ---------------------------------------------------------------------------

def _tokenize(s: str) -> frozenset[str]:
    """``Geofabrik.tokenize``: lower-case, split on non-letters."""
    return frozenset(t for t in re.split(r"[^a-z]+", s.lower()) if t)


_GEOFABRIK_CACHE: dict[str, list] = {}


def geofabrik_download_url(search: str,
                           fetch: Callable[[str], bytes] | None = None,
                           index_url: str = GEOFABRIK_INDEX_URL) -> str:
    """Resolve an area name/id to its Geofabrik ``.osm.pbf`` URL.

    Search precedence (``Geofabrik.searchIndexForDownloadUrl``): the
    query's token set must equal an entry's id/iso-code tokens, else
    equal its name tokens, else be a subset of its name tokens; the
    first non-empty tier must hold exactly one entry.  The index is
    fetched once per URL and cached.
    """
    fetch = fetch or _default_fetch
    if index_url not in _GEOFABRIK_CACHE:
        _GEOFABRIK_CACHE[index_url] = json.loads(
            fetch(index_url).decode())["features"]
    features = _GEOFABRIK_CACHE[index_url]
    want = _tokenize(search)
    by_id: list[dict] = []
    exact: list[dict] = []
    approx: list[dict] = []
    for feat in features:
        props = feat.get("properties", feat)
        urls = props.get("urls") or {}
        if "pbf" not in urls:
            continue
        # name tokens stay OUT of the id tier: id beats name (the
        # reference resolves id='georgia' over name='Georgia' of
        # us/georgia — Geofabrik.searchIndexForDownloadUrl tier order)
        ids = [props.get("id", "")]
        ids += props.get("iso3166-1:alpha2") or []
        ids += props.get("iso3166-2") or []
        name_tokens = _tokenize(props.get("name", ""))
        if any(_tokenize(i) == want for i in ids):
            by_id.append(props)
        elif name_tokens == want:
            exact.append(props)
        elif want and want <= name_tokens:
            approx.append(props)
    for tier, hits in (("exact ID", by_id), ("exact name", exact),
                       ("approximate name", approx)):
        if len(hits) > 1:
            raise ValueError(
                f"Multiple {tier} matches for {search!r}: "
                + ", ".join(h.get("id", "?") for h in hits))
        if hits:
            return hits[0]["urls"]["pbf"]
    raise ValueError(f"No matches for {search!r}")


# ---------------------------------------------------------------------------
# AWS OSM (S3 bucket index)
# ---------------------------------------------------------------------------

class AwsOsmCatalog:
    """S3 ``list-type=2`` bucket catalog (``util/AwsOsm.java``).

    ``download_url("latest")`` → lexicographically greatest key ending
    ``.osm.pbf``; ``download_url("YYMMDD")`` → the single key ending
    ``/planet-YYMMDD.osm.pbf``.  Pages follow ``NextContinuationToken``
    up to ``max_pages``; entries are cached after the first listing.
    """

    def __init__(self, bucket_index_url: str, max_pages: int = 100):
        self.bucket_index_url = bucket_index_url
        self.max_pages = max_pages
        self._keys: list[str] | None = None

    def _ns(self, tag: str, root: ET.Element) -> str:
        m = re.match(r"\{.*\}", root.tag)
        return (m.group(0) if m else "") + tag

    def _index(self, fetch: Callable[[str], bytes]) -> list[str]:
        if self._keys is not None:
            return self._keys
        keys: list[str] = []
        next_param = ""
        for page in range(self.max_pages + 1):
            if page == self.max_pages:
                raise ValueError(
                    f"Too many entries in {self.bucket_index_url} "
                    "to page through")
            root = ET.fromstring(
                fetch(self.bucket_index_url + "?list-type=2" + next_param))
            for c in root.iter(self._ns("Contents", root)):
                k = c.find(self._ns("Key", root))
                if k is not None and k.text:
                    keys.append(k.text)
            truncated = root.findtext(self._ns("IsTruncated", root), "false")
            token = root.findtext(self._ns("NextContinuationToken", root))
            if truncated.lower() != "true" or not token:
                break
            next_param = "&continuation-token=" + quote(token, safe="")
        self._keys = keys
        return keys

    def download_url(self, search: str,
                     fetch: Callable[[str], bytes] | None = None) -> str:
        keys = self._index(fetch or _default_fetch)
        if search.lower() == "latest":
            pbf = [k for k in keys if k.endswith(".osm.pbf")]
            if not pbf:
                raise ValueError(
                    "Unable to find latest AWS osm download URL")
            return self.bucket_index_url + max(pbf)
        hits = [k for k in keys
                if k.endswith(f"/planet-{search}.osm.pbf")]
        if not hits:
            raise ValueError(
                f"Unable to find AWS osm download URL for {search}")
        if len(hits) > 1:
            raise ValueError(
                f"Found multiple AWS osm download URLs for {search}: "
                f"{[self.bucket_index_url + h for h in hits]}")
        return self.bucket_index_url + hits[0]


OSM_PDS = AwsOsmCatalog(OSM_PDS_BUCKET)
OVERTURE = AwsOsmCatalog(OVERTURE_BUCKET)


# ---------------------------------------------------------------------------
# Overture STAC
# ---------------------------------------------------------------------------

def _resolve(base: str, href: str) -> str:
    if href.startswith(("http://", "https://")):
        return href
    return urljoin(base, href)


def _href_segment(href: str) -> str:
    """First meaningful path segment of ``./buildings/catalog.json``."""
    for seg in href.split("/"):
        if seg not in ("", ".", ".."):
            return seg
    return ""


def _child_url(catalog: dict, base: str, name: str) -> str | None:
    for link in catalog.get("links", []):
        if link.get("rel") != "child":
            continue
        href = link.get("href") or ""
        title = link.get("title") or ""
        if name.lower() in (title.lower(), _href_segment(href).lower()):
            return _resolve(base, href)
    return None


def _bbox_intersects(bbox: Iterable[float] | None,
                     bounds: tuple[float, float, float, float]) -> bool:
    if bbox is None:
        return True           # no declared bbox → cannot exclude
    b = list(bbox)
    if len(b) >= 6:
        # 3D STAC bbox: [west, south, minElev, east, north, maxElev]
        x0, y0, x1, y1 = b[0], b[1], b[3], b[4]
    else:
        x0, y0, x1, y1 = b[:4]
    bx0, by0, bx1, by1 = bounds
    return not (x1 < bx0 or bx1 < x0 or y1 < by0 or by1 < y0)


def overture_parquet_urls(theme: str, type_: str,
                          bounds: tuple[float, float, float, float]
                          | None = None,
                          catalog_url: str = OVERTURE_STAC_CATALOG,
                          fetch: Callable[[str], bytes] | None = None,
                          max_workers: int = 16) -> list[str]:
    """Parquet asset URLs for ``theme``/``type_`` in the latest Overture
    release whose item bbox intersects ``bounds`` (lon/lat minx, miny,
    maxx, maxy; ``None`` = world).  STAC walk per
    ``OvertureStac.getParquetUrls``; items fetch concurrently (the
    reference uses virtual threads — network-bound, so a thread pool,
    not Ray tasks)."""
    fetch = fetch or _default_fetch
    get = lambda url: json.loads(fetch(url).decode())  # noqa: E731

    catalog = get(catalog_url)
    release_url = None
    for link in catalog.get("links", []):
        if link.get("rel") == "child" and link.get("latest"):
            release_url = _resolve(catalog_url, link["href"])
            break
    if release_url is None and catalog.get("latest"):
        release_url = _resolve(catalog_url,
                               f"./{catalog['latest']}/catalog.json")
    if release_url is None:
        raise ValueError(
            f"Could not find latest Overture release in {catalog_url}")

    theme_url = _child_url(get(release_url), release_url, theme)
    if theme_url is None:
        raise ValueError(f"Overture theme {theme!r} not found in "
                         f"catalog {release_url}")
    coll_url = _child_url(get(theme_url), theme_url, type_)
    if coll_url is None:
        raise ValueError(f"Overture type {type_!r} not found in theme "
                         f"{theme!r} catalog {theme_url}")
    collection = get(coll_url)

    if bounds is not None:
        boxes = (collection.get("extent", {}).get("spatial", {})
                 .get("bbox") or [])
        if boxes and not any(_bbox_intersects(b, bounds) for b in boxes):
            return []

    item_urls = [_resolve(coll_url, link["href"])
                 for link in collection.get("links", [])
                 if link.get("rel") == "item"]

    def item_asset(item_url: str) -> str | None:
        item = get(item_url)
        if bounds is not None and not _bbox_intersects(
                item.get("bbox"), bounds):
            return None
        assets = item.get("assets", {})
        for key in ("aws", "azure"):        # prefer AWS, fall back Azure
            href = (assets.get(key) or {}).get("href")
            if href:
                return _resolve(item_url, href)
        return None

    with ThreadPoolExecutor(max_workers=max_workers) as pool:
        urls = [u for u in pool.map(item_asset, item_urls) if u]
    return urls
