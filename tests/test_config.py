"""Run-config parsing/validation vs the reference's schema semantics."""

from __future__ import annotations

import pytest

from oco3_data_transformer_spark.config import ConfigError, RunConfig

GOOD = """
output:
  local: file:///tmp/store/
  global: false
  naming: {pre_qf: pre_root, post_qf: post_root}
  drop-empty: true
  cog:
    output: {local: file:///tmp/cog/}
input:
  files:
    - /tmp/oco3_LtCO2_200303_B10400Br.nc4
    - {path: s3://b/k.nc4, mission: oco2}
variables:
  oco3:
    - {group: /, name: xco2}
  oco3_sif:
    - {group: /, name: Daily_SIF_757nm}
grid: {latitude: 800, longitude: 800, method: nearest}
chunking: {latitude: 250, longitude: 250, time: 5}
max-workers: 8
mask-scaling: 1.2
target-file: {oco3: /tmp/targets.json}
"""


def test_parse_full_config():
    cfg = RunConfig.parse(GOOD)
    assert cfg.store_path == "file:///tmp/store/"
    assert cfg.input_files == [
        {"path": "/tmp/oco3_LtCO2_200303_B10400Br.nc4", "mission": "oco3"},
        {"path": "s3://b/k.nc4", "mission": "oco2"},
    ]
    assert cfg.variables == {"oco3": ["xco2"], "oco3_sif": ["Daily_SIF_757nm"]}
    assert (cfg.grid_lat_res, cfg.grid_lon_res, cfg.grid_method) == (800, 800, "nearest")
    assert cfg.mask_scale == 1.2
    assert cfg.shuffle_partitions == 8
    assert cfg.export_path == "file:///tmp/cog/"
    assert cfg.targets == {"oco3": "/tmp/targets.json"}
    assert cfg.naming == {"pre_qf": "pre_root", "post_qf": "post_root"}


@pytest.mark.parametrize(
    "mutation, path",
    [
        ("output: 3", "output"),
        ("output: {naming: {pre_qf: a, post_qf: b}}", "output.local"),
        ("input: {}", "input"),
        ("grid: {method: bilinear}", "grid.method"),
        ("mask-scaling: 1.9", "mask-scaling"),
        ("mask-scaling: 0.5", "mask-scaling"),
        ("variables: {mars: []}", "variables"),
        ("input:\n  files:\n    - {mission: oco3}", "input.files"),
    ],
)
def test_rejects_bad_configs(mutation, path):
    base = (
        "output: {local: file:///tmp/s/}\n"
        "input: {files: [/tmp/a.nc4]}\n"
    )
    text = base + mutation if not mutation.startswith(("output", "input")) else (
        mutation + "\n" + ("input: {files: [/tmp/a.nc4]}\n" if mutation.startswith("output") else "output: {local: file:///t/}\n")
    )
    with pytest.raises(ConfigError) as ei:
        RunConfig.parse(text)
    assert path.split(".")[0] in str(ei.value)


def test_defaults():
    cfg = RunConfig.parse("output: {local: /s}\ninput: {files: []}")
    assert cfg.grid_method == "nearest"
    assert cfg.mask_scale == 1.0
    assert cfg.drop_empty is True
    assert cfg.stream_input_dir is None


def test_stream_input():
    cfg = RunConfig.parse("output: {local: /s}\ninput: {stream: {dir: /drop}}")
    assert cfg.stream_input_dir == "/drop"


def test_invalid_yaml():
    with pytest.raises(ConfigError):
        RunConfig.parse("output: [unclosed")
