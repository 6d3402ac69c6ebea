"""Tests for output-shaping flags (skipFilledTiles / excludeIds /
maxPointBuffer), per-feature zoom windows (ZoomFunction), and the
checkpoint resume-config guard."""

import numpy as np
import pyarrow as pa
import pytest

from planetiler_ray import fixtures
from planetiler_ray.functions.zoomfn import (ZoomFunction, max_zoom, min_zoom,
                                             zoom_range)
from planetiler_ray.stages.render import RenderConfig, render_fanout


def _georef_table(n=40, extra=None):
    ids = fixtures.image_ids(n)
    g = fixtures.georef_from_ids(ids)
    cols = {"image_id": pa.array(ids.tolist(), pa.string()),
            "idx": pa.array(g["idx"]), "cx": pa.array(g["cx"]),
            "cy": pa.array(g["cy"]), "hw": pa.array(g["hw"]),
            "hh": pa.array(g["hh"])}
    cols.update(extra or {})
    return pa.table(cols)


class TestZoomFunction:
    def test_floor_entry_semantics(self):
        zf = ZoomFunction([(4, 10), (8, 20), (12, 30)], fallback=-1)
        assert zf.apply(3) == -1
        assert zf.apply(4) == 10
        assert zf.apply(7) == 10
        assert zf.apply(8) == 20
        assert zf.apply(14) == 30

    def test_vectorized_at(self):
        zf = ZoomFunction([(4, 10.0), (8, 20.0)], fallback=0.0)
        out = zf.at(np.array([0, 4, 6, 8, 14]))
        assert out.tolist() == [0.0, 10.0, 10.0, 20.0, 20.0]

    def test_gates(self):
        z = np.array([2, 5, 9])
        assert min_zoom(z, 5).tolist() == [False, True, True]
        assert max_zoom(z, 5).tolist() == [True, True, False]
        assert zoom_range(z, 3, 8).tolist() == [False, True, False]


class TestPerFeatureZoomWindow:
    def test_window_limits_fanout(self):
        cfg = RenderConfig(0, 6)
        base = render_fanout(_georef_table(), cfg)
        t = _georef_table(extra={
            "feat_min_zoom": pa.array(np.full(40, 3, np.int64)),
            "feat_max_zoom": pa.array(np.full(40, 5, np.int64))})
        windowed = render_fanout(t, cfg)
        assert windowed.num_rows < base.num_rows
        from planetiler_ray.tilemath.tilecoord import tms_decode
        _, _, z = tms_decode(windowed["tile_id"].to_numpy())
        assert z.min() >= 3 and z.max() <= 5

    def test_per_feature_windows_differ(self):
        minz = np.where(np.arange(40) % 2 == 0, 0, 6).astype(np.int64)
        t = _georef_table(extra={"feat_min_zoom": pa.array(minz)})
        out = render_fanout(t, RenderConfig(0, 6))
        from planetiler_ray.tilemath.tilecoord import tms_decode
        _, _, z = tms_decode(out["tile_id"].to_numpy())
        odd = out["idx"].to_numpy() % 2 == 1
        assert (z[odd] == 6).all()          # odd features only at z6
        assert (z[~odd] <= 6).all() and (z[~odd].min() == 0)


class TestExcludeIds:
    def test_excluded_ids_absent(self):
        cfg = RenderConfig(0, 4, exclude_ids=frozenset({1, 3, 5}))
        out = render_fanout(_georef_table(), cfg)
        assert not np.isin(out["idx"].to_numpy(), [1, 3, 5]).any()


class TestReduceFlags:
    def _frag_table(self, rows):
        cols = {k: [] for k in ("tile_id", "layer", "kind", "idx", "sort_key",
                                "group_id", "ax", "ay", "bx", "by", "is_fill")}
        for r in rows:
            for k in cols:
                cols[k].append(r[k])
        return pa.table({
            "tile_id": pa.array(cols["tile_id"], pa.int64()),
            "layer": pa.array(cols["layer"], pa.int8()),
            "kind": pa.array(cols["kind"], pa.int8()),
            "idx": pa.array(cols["idx"], pa.int64()),
            "sort_key": pa.array(cols["sort_key"], pa.int32()),
            "group_id": pa.array(cols["group_id"], pa.int64()),
            "ax": pa.array(cols["ax"], pa.float32()),
            "ay": pa.array(cols["ay"], pa.float32()),
            "bx": pa.array(cols["bx"], pa.float32()),
            "by": pa.array(cols["by"], pa.float32()),
            "is_fill": pa.array(cols["is_fill"], pa.bool_()),
        })

    def _row(self, tile, kind=1, idx=0, ax=10.0, ay=10.0, fill=False):
        return {"tile_id": tile, "layer": 1 if kind == 1 else 0, "kind": kind,
                "idx": idx, "sort_key": 0, "group_id": 0,
                "ax": ax, "ay": ay, "bx": ax + 5, "by": ay + 5,
                "is_fill": fill}

    def test_max_point_buffer_drops_far_points(self):
        from planetiler_ray.stages.reduce import reduce_partition
        t = self._frag_table([
            self._row(100, idx=1, ax=10.0),
            self._row(100, idx=2, ax=-30.0),       # 30 px outside
            self._row(100, idx=3, ax=280.0),       # 24 px outside
        ])
        out = reduce_partition(t, with_feature_ids=False, max_point_buffer=8.0)
        assert out["n_features"].to_pylist() == [1]
        out2 = reduce_partition(t, with_feature_ids=False)
        assert out2["n_features"].to_pylist() == [3]

    def test_skip_filled_tiles(self):
        from planetiler_ray.stages.reduce import reduce_partition
        t = self._frag_table([
            self._row(50, kind=0, idx=1, fill=True),
            self._row(50, kind=0, idx=2, fill=True),
            self._row(60, kind=0, idx=3, fill=True),
            self._row(60, kind=0, idx=4, fill=False),
        ])
        out = reduce_partition(t, with_feature_ids=False,
                               skip_filled_tiles=True)
        assert out["tile_id"].to_pylist() == [60]
        out2 = reduce_partition(t, with_feature_ids=False)
        assert out2["tile_id"].to_pylist() == [50, 60]


class TestReduceRegressions(TestReduceFlags):
    """Round-5 review fixes: dedup runs BEFORE the label-grid limit and
    the empty-group fast path matches the non-empty schema."""

    def test_duplicate_fragment_does_not_consume_grid_slot(self):
        from planetiler_ray.stages.reduce import reduce_partition

        def r(idx, sk):
            row = self._row(100, idx=idx)
            row["sort_key"] = sk
            row["group_id"] = 7          # one shared label-grid cell
            return row

        # 4 distinct features in a limit-4 cell, plus a DUPLICATE of
        # the best-ranked one (dirty input): the duplicate must not
        # consume a grid slot and evict idx=4
        t = self._frag_table([r(1, 0), r(1, 0), r(2, 1), r(3, 2), r(4, 3)])
        out = reduce_partition(t, with_feature_ids=False)
        assert out["n_features"].to_pylist() == [4]
        # and the keep-4 winners are the 4 DISTINCT fragments
        t5 = self._frag_table([r(1, 0), r(1, 0), r(2, 1), r(3, 2),
                               r(4, 3), r(5, 4)])
        out5 = reduce_partition(t5, with_feature_ids=False)
        assert out5["n_features"].to_pylist() == [4]

    def test_empty_group_schema_matches_mvt_mode(self):
        from planetiler_ray.stages.reduce import reduce_partition
        t = self._frag_table([self._row(100, idx=1)])
        t = t.append_column("caption", pa.array(["c"], pa.string()))
        empty = t.slice(0, 0)
        full = reduce_partition(t, with_feature_ids=True,
                                mvt_attrs=("caption",))
        nothing = reduce_partition(empty, with_feature_ids=True,
                                   mvt_attrs=("caption",))
        assert nothing.num_rows == 0
        assert nothing.schema == full.schema


class TestResumeGuard:
    def test_mismatched_config_refused(self, tmp_path):
        from planetiler_ray.state.checkpoint import CheckpointStore
        s = CheckpointStore(str(tmp_path / "cp"))
        s.check_run_config({"num_partitions": 8, "bounds": [1, 2, 3]})
        s.check_run_config({"num_partitions": 8, "bounds": [1, 2, 3]})  # same ok
        with pytest.raises(ValueError, match="different run configuration"):
            s.check_run_config({"num_partitions": 16, "bounds": [1, 2, 3]})
