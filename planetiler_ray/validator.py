"""Schema-spec validation runner — the ``--tests`` / verify analog.

Mirrors the reference's schema validator
(``validator/BaseSchemaValidator.java:35-60``,
``validator/SchemaSpecification.java``): a YAML spec lists example
inputs (georeferenced chips or lon/lat points) and the tiles/layers
they are expected to land in; the runner executes ONLY the
georef→fan-out stages single-process (no Ray, no sort, no archive —
exactly like the reference running ``profile.processFeature`` alone)
and diffs expected vs actual.

Spec format:

    examples:
      - name: point hits one tile
        input: {lon: 0.0, lat: 0.0, w: 16, h: 16}   # or {image_id: img…}
        zoom: 5
        expect:
          tiles: [[16, 16]]          # [x, y] pairs that MUST be covered
          min_count: 1               # optional: minimum tiles touched
          layers: [0, 1]             # optional: layer ids expected
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import yaml

from .fixtures import georef_from_ids
from .stages.render import RenderConfig, render_fanout
from .tilemath.projection import get_world_x, get_world_y


def _example_to_georef(inp: dict) -> pa.Table:
    if "image_id" in inp:
        g = georef_from_ids(np.array([inp["image_id"]]))
        cx, cy = float(g["cx"][0]), float(g["cy"][0])
        hw, hh = float(g["hw"][0]), float(g["hh"][0])
        idx = int(g["idx"][0])
        image_id = inp["image_id"]
    else:
        cx = float(get_world_x(inp["lon"]))
        cy = float(get_world_y(inp["lat"]))
        hw = inp.get("w", 16) * 2.0 ** -23
        hh = inp.get("h", 16) * 2.0 ** -23
        idx, image_id = 0, "example"
    return pa.table({
        "image_id": pa.array([image_id], pa.string()),
        "idx": pa.array([idx], pa.int64()),
        "cx": pa.array([cx]), "cy": pa.array([cy]),
        "hw": pa.array([hw]), "hh": pa.array([hh]),
    })


def run_example(example: dict) -> dict:
    """Run one spec example through the fan-out; return the diff result."""
    zoom = int(example.get("zoom", 14))
    cfg = RenderConfig(min_zoom=zoom, max_zoom=zoom)
    frags = render_fanout(_example_to_georef(example["input"]), cfg)
    got_tiles = sorted({(int(x), int(y))
                        for x, y in zip(frags["x"].to_numpy(),
                                        frags["y"].to_numpy())})
    got_layers = sorted(set(frags["layer"].to_numpy().tolist()))
    expect = example.get("expect", {})
    problems = []
    for pair in expect.get("tiles", []):
        if tuple(pair) not in got_tiles:
            problems.append(f"expected tile {pair} not covered (got {got_tiles})")
    if "min_count" in expect and len(got_tiles) < expect["min_count"]:
        problems.append(f"covered {len(got_tiles)} tiles < min {expect['min_count']}")
    if "layers" in expect and got_layers != sorted(expect["layers"]):
        problems.append(f"layers {got_layers} != expected {sorted(expect['layers'])}")
    return {"name": example.get("name", "?"), "ok": not problems,
            "problems": problems, "tiles": got_tiles, "layers": got_layers}


def run_spec(path: str) -> list[dict]:
    with open(path) as f:
        spec = yaml.safe_load(f)
    return [run_example(ex) for ex in spec.get("examples", [])]
