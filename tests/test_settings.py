"""Settings-layer parity with the reference's validation semantics
(mirrors reference tests/test_tippecanoe.py cases — see FIXTURES.md §7)."""

import pytest

from cloudtile_spark.settings import TilingSettings


def test_default_settings_golden():
    """Exact default dict — the analogue of reference
    tests/test_tippecanoe.py:75-98 golden assertion."""
    ts = TilingSettings()
    assert dict(ts) == {
        "force": True,
        "read-parallel": True,
        "coalesce-densest-as-needed": True,
        "simplification": 10,
        "maximum-tile-bytes": 2500000,
        "maximum-tile-features": 20000,
        "no-tile-compression": True,
    }


def test_unknown_key_rejected():
    ts = TilingSettings()
    with pytest.raises(KeyError):
        ts["not-a-real-option"] = 1


def test_commented_keys_are_valid():
    ts = TilingSettings()
    ts["drop-rate"] = 2.5
    ts["hilbert"] = True
    assert ts["drop-rate"] == 2.5


def test_underscore_normalization():
    ts = TilingSettings(minimum_zoom=3)
    assert ts["minimum-zoom"] == 3


def test_zoom_ordering_both_directions():
    ts = TilingSettings()
    ts["minimum-zoom"] = 5
    with pytest.raises(ValueError):
        ts["maximum-zoom"] = 4
    ts2 = TilingSettings()
    ts2["maximum-zoom"] = 4
    with pytest.raises(ValueError):
        ts2["minimum-zoom"] = 5


def test_guess_maximum_zoom_accepted():
    ts = TilingSettings()
    ts["minimum-zoom"] = 5
    ts["maximum-zoom"] = "g"
    assert ts["maximum-zoom"] == "g"


def test_empty_config_raises(tmp_path):
    p = tmp_path / "empty.yaml"
    p.write_text("")
    with pytest.raises(ValueError):
        TilingSettings(cfg_path=str(p))


def test_missing_config_raises():
    with pytest.raises(FileNotFoundError):
        TilingSettings(cfg_path="/nonexistent/file.yaml")


def test_override_precedence(tmp_path):
    p = tmp_path / "cfg.yaml"
    p.write_text("Line and polygon simplification:\n  simplification: 4\n")
    ts = TilingSettings(cfg_path=str(p), simplification=7)
    assert ts["simplification"] == 7
    ts2 = TilingSettings(cfg_path=str(p))
    assert dict(ts2) == {"simplification": 4}  # config file replaces defaults


def test_repr_hides_false():
    ts = TilingSettings()
    ts["hilbert"] = False
    assert "hilbert" not in repr(ts)


def test_job_spec_roundtrip():
    import json

    s = TilingSettings()
    s["minimum-zoom"] = 2
    s["maximum-zoom"] = 9
    s["simplification"] = 4
    s["visvalingam"] = True
    s["accumulate-attribute"] = {"nc": "sum"}
    spec = s.to_job_spec("pyramid", "synth:1000", "/tmp/out", cores=8)
    back = json.loads(json.dumps(spec))  # survives the JSON wire format
    s2 = TilingSettings.from_job_spec(back)
    assert dict(s2) == dict(s)
    assert back["job"] == "pyramid" and back["cores"] == 8
    # invalid keys still rejected after the hop
    back["settings"]["bogus-key"] = 1
    with pytest.raises(KeyError):
        TilingSettings.from_job_spec(back)
