"""Declarative YAML profile config — the custommap analog.

Mirrors the reference's planetiler-custommap schema
(``SchemaConfig.java:12-24``, ``FeatureItem.java:8-37``): a YAML file
declares per-layer include/exclude boolean trees over feature
attributes, which compile to the engine's vectorized expression masks
(:mod:`planetiler_ray.functions.expression`) wrapped in a
:class:`~planetiler_ray.profile.Profile`.

Schema (subset):

    profile:
      name: my-map
      include_when:            # boolean tree over georef columns
        and:
          - {field: caption, match: ["%river%", "%lake%"]}
          - not: {field: caption, match: ["%old%"]}
      min_zoom: 0
      max_zoom: 14

Boolean-tree nodes: ``{field, match: [values-with-%-wildcards]}``,
``{field, present: true}``, ``{field, cmp: ">=", value: 5}``,
``{and: [...]}, {or: [...]}, {not: node}``.
"""

from __future__ import annotations

import yaml

from .functions import expression as E
from .profile import DefaultProfile
from .stages.render import RenderConfig


def compile_expression(node) -> "E.Expr":
    if not isinstance(node, dict):
        raise ValueError(f"bad expression node: {node!r}")
    if "and" in node:
        return E.and_(*[compile_expression(n) for n in node["and"]])
    if "or" in node:
        return E.or_(*[compile_expression(n) for n in node["or"]])
    if "not" in node:
        return E.not_(compile_expression(node["not"]))
    field = node.get("field")
    if field is None:
        raise ValueError(f"expression node needs a field: {node!r}")
    if "match" in node:
        return E.match_any(field, list(node["match"]))
    if node.get("present"):
        return E.match_field(field)
    if "cmp" in node:
        return E.cmp(field, node["cmp"], node["value"])
    raise ValueError(f"unknown expression node: {node!r}")


class ConfiguredProfile(DefaultProfile):
    """Profile driven by a declarative config dict."""

    def __init__(self, cfg: dict):
        self.name = cfg.get("name", "configured")
        self.include = (compile_expression(cfg["include_when"])
                        if "include_when" in cfg else None)
        self.exclude = (compile_expression(cfg["exclude_when"])
                        if "exclude_when" in cfg else None)
        self.render = RenderConfig(min_zoom=int(cfg.get("min_zoom", 0)),
                                   max_zoom=int(cfg.get("max_zoom", 14)))

    def process_features(self, georef):
        import pyarrow.compute as pc
        mask = None
        if self.include is not None:
            mask = self.include(georef)
        if self.exclude is not None:
            ex = pc.invert(self.exclude(georef))
            mask = ex if mask is None else pc.and_(mask, ex)
        return georef if mask is None else georef.filter(mask)


def profile_from_yaml(path: str) -> ConfiguredProfile:
    with open(path) as f:
        doc = yaml.safe_load(f)
    return ConfiguredProfile(doc.get("profile", doc))


def osm_rules_from_yaml(path: str) -> list:
    """Load OSM profile layer rules from the custommap-style YAML:

        layers:
          - name: roads
            element: line            # point | line | area
            include_when: {field: highway, present: true}
            attrs: [highway, name]

    Each ``include_when`` boolean tree compiles to a vectorized
    expression mask (``compile_expression``)."""
    from .pipelines.osm import OsmLayerRule

    with open(path) as f:
        cfg = yaml.safe_load(f)
    rules = []
    for lay in cfg.get("layers", []):
        from .functions import expression as E
        expr = compile_expression(lay["include_when"]) \
            if "include_when" in lay else E.TRUE   # typed bool, 0-row safe
        # fields referenced anywhere in the boolean tree must be
        # promoted from the tag lists even when not kept as attrs
        def walk(node, acc):
            if isinstance(node, dict):
                if "field" in node:
                    acc.add(node["field"])
                for v in node.values():
                    walk(v, acc)
            elif isinstance(node, list):
                for v in node:
                    walk(v, acc)
            return acc
        fields = walk(lay.get("include_when", {}), set())
        # attrs entries: plain tag keys, or {key: name, value: <expr>}
        # computed attr-value expressions (the custommap
        # ConfigExpressionParser forms — functions.valueexpr)
        from .functions.valueexpr import compile_value_expression
        plain, computed = [], {}
        # engine-internal fan-out / apply_rules columns an attr may not
        # shadow (a collision would silently corrupt the fragment
        # stream or the zoom windows) — applies to BOTH the plain
        # string form and the {key, value} computed form
        _RESERVED = {"z", "layer", "kind", "geom_id", "is_fill",
                     "vx", "vy", "part", "x", "y", "row",
                     "layer_id", "min_zoom", "max_zoom", "xs", "ys"}

        def _check_attr_name(name: str) -> str:
            if name in _RESERVED:
                raise ValueError(
                    f"attr name {name!r} shadows an internal "
                    f"column; rename it (reserved: {sorted(_RESERVED)})")
            return name

        for a in lay.get("attrs", []):
            if isinstance(a, dict):
                _check_attr_name(a["key"])
                computed[a["key"]] = compile_value_expression(
                    a.get("value", a.get("expr")))
                walk(a.get("value", a.get("expr")), fields)
                for k in _tag_values_in(a.get("value", a.get("expr"))):
                    fields.add(k)
            else:
                plain.append(_check_attr_name(a))
        rules.append(OsmLayerRule(
            lay["name"], lay.get("element", "line"), expr,
            attrs=tuple(plain),
            tag_keys=tuple(sorted(fields | set(plain))),
            min_zoom=int(lay.get("min_zoom", 0)),
            max_zoom=int(lay.get("max_zoom", 15)),
            computed_attrs=computed))
    return rules


def _tag_values_in(node, acc=None) -> set:
    """Tag keys referenced by a value expression: ``tag_value`` forms
    and bare identifiers inside ``${…}`` scripts — these must be
    promoted from the tag lists even when not kept as plain attrs."""
    if acc is None:
        acc = set()
    if isinstance(node, dict):
        if "tag_value" in node and isinstance(node["tag_value"], str):
            acc.add(node["tag_value"])
        for v in node.values():
            _tag_values_in(v, acc)
    elif isinstance(node, list):
        for v in node:
            _tag_values_in(v, acc)
    elif isinstance(node, str):
        from .functions.valueexpr import script_tag_keys
        acc |= script_tag_keys(node)
    return acc
