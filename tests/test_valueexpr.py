"""Custommap attr-value expressions (functions.valueexpr) — the
``ConfigExpressionParser.java:69-157`` form dispatch (constants,
tag_value, coalesce, type casts, match/overrides) and the ``${…}``
arithmetic/string script subset compiled to Arrow compute — plus the
end-to-end flow: a YAML layer with computed attrs through the OSM
rule pipeline into encoded MVT attributes."""

import numpy as np
import pyarrow as pa
import pytest

from planetiler_ray.functions.valueexpr import (compile_value_expression,
                                                is_script, unescape)


def T(**cols):
    return pa.table({k: pa.array(v) for k, v in cols.items()})


def test_forms():
    t = T(name=["a", None, "ccc"], ref=["r1", "r2", None],
          width=["2", "3.5", None])
    const = compile_value_expression(5)
    assert const(t).to_pylist() == [5, 5, 5]
    tag = compile_value_expression({"tag_value": "name"})
    assert tag(t).to_pylist() == ["a", None, "ccc"]
    missing = compile_value_expression({"tag_value": "nope"})
    assert missing(t).to_pylist() == [None] * 3
    co = compile_value_expression({"coalesce": [{"tag_value": "name"},
                                                {"tag_value": "ref"},
                                                "x"]})
    assert co(t).to_pylist() == ["a", "r2", "ccc"]
    cast = compile_value_expression({"type": "double",
                                     "value": {"tag_value": "width"}})
    assert cast(t).to_pylist() == [2.0, 3.5, None]
    casti = compile_value_expression({"type": "integer",
                                      "value": {"tag_value": "width"}})
    assert casti(t).to_pylist() == [2, 3, None]
    castb = compile_value_expression({"type": "boolean",
                                      "value": {"tag_value": "name"}})
    assert castb(t).to_pylist() == [False, False, False]
    assert compile_value_expression({"type": "boolean", "value": "yes"}) \
        (t).to_pylist() == [True] * 3


def test_match_form():
    t = T(highway=["motorway", "path", "residential"],
          surface=[None, "dirt", None])
    expr = compile_value_expression({"match": [
        {"if": {"field": "highway", "match": ["motorway"]}, "value": "M"},
        {"if": {"field": "surface", "present": True}, "value":
            {"tag_value": "surface"}},
        {"else": "other"},
    ]})
    assert expr(t).to_pylist() == ["M", "dirt", "other"]
    ov = compile_value_expression({
        "default_value": "d",
        "overrides": [{"if": {"field": "highway", "match": ["path"]},
                       "value": "P"}]})
    assert ov(t).to_pylist() == ["d", "P", "d"]


def test_scripts():
    t = T(width=["2", "4", "6"], name=["ab", "c", None],
          lanes=["1", None, "3"])
    assert is_script("${ 1 + 2 }") and not is_script("plain")
    assert unescape("\\${ x }") == "${ x }"
    s = compile_value_expression("${ num(width) * 2 + 1 }")
    assert s(t).to_pylist() == [5.0, 9.0, 13.0]
    s2 = compile_value_expression("${ name + '-' + width }")
    assert s2(t).to_pylist() == ["ab-2", "c-4", None]
    s3 = compile_value_expression("${ num(width) >= 4 && num(width) < 6 }")
    assert s3(t).to_pylist() == [False, True, False]
    s4 = compile_value_expression("${ coalesce(lanes, width) }")
    assert s4(t).to_pylist() == ["1", "4", "3"]
    s5 = compile_value_expression("${ upper(name) }")
    assert s5(t).to_pylist() == ["AB", "C", None]
    s6 = compile_value_expression("${ min2(num(width), 4) }")
    assert s6(t).to_pylist() == [2.0, 4.0, 4.0]
    s7 = compile_value_expression("${ num(width) % 4 }")
    assert s7(t).to_pylist() == [2.0, 0.0, 2.0]
    with pytest.raises(ValueError):
        compile_value_expression("${ __import__('os') }")
    with pytest.raises(ValueError):
        compile_value_expression("${ [1,2] }")


def test_computed_attrs_through_osm_rules(ray_session, tmp_path):
    """YAML layer with computed attrs flows into the encoded MVT —
    the osm_line_tiles-style path."""
    import gzip
    import ray.data
    from planetiler_ray.config import osm_rules_from_yaml
    from planetiler_ray.pipelines.osm import build_osm_tiles
    from planetiler_ray.tilemath.mvt_pb import decode_tile

    yml = tmp_path / "profile.yaml"
    yml.write_text("""
layers:
  - name: roads
    element: line
    include_when: {field: highway, present: true}
    attrs:
      - highway
      - key: tag
        value: {coalesce: [{tag_value: ref}, {tag_value: highway}]}
      - key: score
        value: "${ num(lanes) * 10 }"
      - key: base
        value: "${ replaceRegex(highway, '_link$', '') }"
      - key: cls
        value: "${ 'major' if matches(highway, '^(primary|trunk|motorway)') else 'minor' }"
""")
    rules = osm_rules_from_yaml(str(yml))
    assert rules[0].attrs == ("highway",)
    assert set(rules[0].computed_attrs) == {"tag", "score", "base", "cls"}
    assert {"highway", "ref", "lanes"} <= set(rules[0].tag_keys)

    nodes = ray.data.from_arrow(pa.table({
        "node_id": pa.array([1, 2], pa.int64()),
        "lon": pa.array([10.0, 25.0]),
        "lat": pa.array([20.0, 35.0]),
        "tag_keys": pa.array([[], []], pa.list_(pa.string())),
        "tag_vals": pa.array([[], []], pa.list_(pa.string())),
    }))
    ways = ray.data.from_arrow(pa.table({
        "way_id": pa.array([7], pa.int64()),
        "refs": pa.array([[1, 2]], pa.list_(pa.int64())),
        "tag_keys": pa.array([["highway", "lanes"]], pa.list_(pa.string())),
        "tag_vals": pa.array([["primary", "2"]], pa.list_(pa.string())),
    }))
    tiles = build_osm_tiles(nodes, ways, rules, min_zoom=3, max_zoom=3,
                            num_partitions=2).take_all()
    assert tiles
    lay = decode_tile(tiles[0]["mvt_bytes"])["roads"]
    f = lay["features"][0]
    attrs = {lay["keys"][f["tags"][i]]: lay["values"][f["tags"][i + 1]]
             for i in range(0, len(f["tags"]), 2)}
    assert attrs["highway"] == "primary"
    assert attrs["tag"] == "primary"          # coalesce fell through
    assert attrs["score"] == "20"             # num(lanes)*10, Arrow float->string
    assert attrs["base"] == "primary"         # replaceRegex (no-op here)
    assert attrs["cls"] == "major"            # regex conditional

    # internal-column shadowing is refused loudly, not silently broken
    bad = tmp_path / "bad.yaml"
    bad.write_text("""
layers:
  - name: r
    element: line
    include_when: {field: highway, present: true}
    attrs:
      - {key: kind, value: "${ upper(highway) }"}
""")
    with pytest.raises(ValueError, match="shadows an internal"):
        osm_rules_from_yaml(str(bad))

    # the PLAIN string attr form is guarded too (regression: only the
    # dict form was checked, so `attrs: [part]` slipped through)
    bad2 = tmp_path / "bad2.yaml"
    bad2.write_text("""
layers:
  - name: r
    element: line
    include_when: {field: highway, present: true}
    attrs: [part]
""")
    with pytest.raises(ValueError, match="shadows an internal"):
        osm_rules_from_yaml(str(bad2))

    # apply_rules-side columns are reserved as well (min_zoom would
    # overwrite the rule's int8 zoom window with a string column)
    bad3 = tmp_path / "bad3.yaml"
    bad3.write_text("""
layers:
  - name: r
    element: line
    include_when: {field: highway, present: true}
    attrs:
      - {key: min_zoom, value: "${ upper(highway) }"}
""")
    with pytest.raises(ValueError, match="shadows an internal"):
        osm_rules_from_yaml(str(bad3))


def test_regex_args_must_be_literals():
    """Non-literal regex pattern/replacement args fail at COMPILE time
    with the function named (regression: they compiled fine and then
    crashed every batch inside a Ray task with an AttributeError)."""
    from planetiler_ray.functions.valueexpr import compile_value_expression
    for src in ("${ matches(ref, name) }",
                "${ replaceRegex(ref, 'a', name) }",
                "${ replaceRegex(ref, name, 'a') }",
                "${ extractRegex(ref, upper(name)) }",
                "${ round(num(lanes), num(ref)) }"):
        with pytest.raises(ValueError, match="must be a literal"):
            compile_value_expression(src)
    # literal args still compile and run
    t = T(ref=["A12", "B7", None])
    f = compile_value_expression("${ extractRegex(ref, '[0-9]+') }")
    assert f(t).to_pylist() == ["12", "7", None]


def test_type_with_direct_tag_value_and_coalesce():
    """{'type': t, 'tag_value': k} and {'type': t, 'coalesce': [...]}
    (no 'value' wrapper) must compile the FORM, not treat the single
    rest value as a constant (regression: the tag NAME was cast)."""
    t = T(lanes=["2", "3", None], ref=["r1", None, "r3"])
    f = compile_value_expression({"type": "integer", "tag_value": "lanes"})
    assert f(t).to_pylist() == [2, 3, None]
    g = compile_value_expression({"type": "string",
                                  "coalesce": [{"tag_value": "lanes"},
                                               {"tag_value": "ref"}]})
    assert g(t).to_pylist() == ["2", "3", "r3"]


def test_script_tag_keys_excludes_functions():
    """script_tag_keys promotes tag identifiers but never the script
    function names (single source of truth with _ScriptCompiler)."""
    from planetiler_ray.functions.valueexpr import script_tag_keys

    keys = script_tag_keys("${ num(lanes) * 10 + len(coalesce(ref, name)) }")
    assert keys == {"lanes", "ref", "name"}
    assert script_tag_keys("not a script") == set()
    assert script_tag_keys("${ upper(") == set()   # syntax error -> empty


def test_script_regex_and_conditionals():
    """CEL-parity extensions: matches / replaceRegex / extractRegex /
    nullif compiled to Arrow regex kernels, and conditional
    expressions (CEL ?:) through pc.if_else."""
    t = T(ref=["A12", "B7", None, "xy"],
          highway=["primary", "secondary", "primary_link", None],
          lanes=["2", "4", None, "1"])

    m = compile_value_expression('${ matches(ref, "[0-9]+") }')
    assert m(t).to_pylist() == [True, True, None, False]

    rr = compile_value_expression(
        '${ replaceRegex(highway, "_link$", "") }')
    assert rr(t).to_pylist() == ["primary", "secondary", "primary", None]

    # $1 backref translation (Java replaceAll convention)
    bk = compile_value_expression(
        '${ replaceRegex(ref, "([A-Z])([0-9]+)", "$2-$1") }')
    assert bk(t).to_pylist() == ["12-A", "7-B", None, "xy"]

    ex = compile_value_expression('${ extractRegex(ref, "[0-9]+") }')
    assert ex(t).to_pylist() == ["12", "7", None, None]

    exg = compile_value_expression(
        '${ extractRegex(ref, "(?P<letter>[A-Z])") }')
    assert exg(t).to_pylist() == ["A", "B", None, None]

    nf = compile_value_expression('${ nullif(highway, "primary") }')
    assert nf(t).to_pylist() == [None, "secondary", "primary_link", None]

    cond = compile_value_expression(
        '${ "major" if matches(highway, "^primary") else "minor" }')
    assert cond(t).to_pylist() == ["major", "minor", "major", "minor"]

    ncond = compile_value_expression(
        '${ num(lanes) * 10 if num(lanes) >= 3 else 0 }')
    assert ncond(t).to_pylist() == [0.0, 40.0, 0.0, 0.0]

    # function names never leak into promoted tag keys
    from planetiler_ray.functions.valueexpr import script_tag_keys
    assert script_tag_keys(
        '${ replaceRegex(ref, "x", "y") if matches(name, "z") else nullif(a, b) }'
    ) == {"ref", "name", "a", "b"}


def test_review_r5b_script_hardening():
    """Round-5 review fixes: chained comparisons refused, && preserved
    inside string literals, dirty numeric strings become null, CEL
    truncated modulo, arity checked at compile time."""
    t = pa.table({
        "name": pa.array(["Main && Co", "Other", "A&&B"]),
        "height": pa.array(["12", "unknown", ""]),
        "v": pa.array([-7.0, 7.0, -7.0]),
    })

    # chained comparison: silent mis-evaluation refused at compile
    with pytest.raises(ValueError, match="chained"):
        compile_value_expression("${ 0 < v < 10000 }")

    # && inside a string LITERAL must not be rewritten to " and "
    eq = compile_value_expression('${ name == "Main && Co" }')
    assert eq(t).to_pylist() == [True, False, False]
    m = compile_value_expression('${ matches(name, "A&&B") }')
    assert m(t).to_pylist() == [False, False, True]

    # unparseable numeric strings -> null, not ArrowInvalid
    n = compile_value_expression("${ num(height) }")
    assert n(t).to_pylist() == [12.0, None, None]
    gt = compile_value_expression("${ height > 10 }")
    assert gt(t).to_pylist() == [True, None, None]
    ci = compile_value_expression({"type": "integer",
                                   "tag_value": "height"})
    assert ci(t).to_pylist() == [12, None, None]

    # truncated modulo (CEL/Java): -7 % 3 == -1, not floor's 2
    md = compile_value_expression("${ v % 3 }")
    assert md(t).to_pylist() == [-1.0, 1.0, -1.0]

    # arity checked at compile time, not IndexError per batch
    with pytest.raises(ValueError, match="matches"):
        compile_value_expression("${ matches(name) }")
    with pytest.raises(ValueError, match="replaceRegex"):
        compile_value_expression('${ replaceRegex(name, "x") }')


def test_expression_masks_typed_on_empty_batch():
    """0-row batches must produce bool-typed masks (a null-type empty
    crashes fill_null / and_ / invert downstream)."""
    import pyarrow.compute as pc

    from planetiler_ray.functions.expression import (FALSE, TRUE,
                                                     match_any, not_)

    empty = pa.table({"kind": pa.array([], pa.string())})
    m = match_any("kind", [])(empty)
    assert pa.types.is_boolean(m.type)
    assert pa.types.is_boolean(TRUE(empty).type)
    assert pa.types.is_boolean(FALSE(empty).type)
    inv = not_(lambda t: FALSE(t))(empty)
    assert pa.types.is_boolean(pa.chunked_array([inv]).type
                               if isinstance(inv, pa.Array) else inv.type)
