"""Run configuration: the engine analog of the reference's yamale-validated
YAML run config (ref runconfig.py:34-82, schema
sam_extract/schema/run-config-schema.yaml:1-60, sample-run-config.yaml).

Field-for-field mapping (reference → engine):
  output.local / output.s3.url  → store_path (any Hadoop-FS URL)
  output.global                 → global_mode (per-target vs global mesh)
  output.naming.{pre,post}_qf   → kept as metadata; one unified store holds
                                  both branches as the `qf` column
  output.drop-empty             → drop_empty (F7)
  output.cog                    → export_path (dense-raster adapter, S8)
  input.files                   → input_files (mixed str | {path, mission})
  input.queue                   → stream_input_dir (file-drop streaming
                                  source replaces RMQ, §2.10)
  variables                     → variables[mission] (F1 projection; group
                                  paths flatten into column names)
  grid.{latitude,longitude,method} → grid_lat_res/grid_lon_res/grid_method
  chunking                      → obsolete (parquet row groups; kept for
                                  compat, ignored)
  max-workers                   → obsolete (Spark task scheduling); mapped
                                  to shuffle_partitions when given
  mask-scaling                  → mask_scale, clamped [1, 1.5] like the
                                  reference's schema bound
  target-file                   → targets[mission] (JSON dim-table path)

Validation raises ``ConfigError`` with a field path, mirroring the
reference's reject-on-bad-config behavior (ref main.py:715-735).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

import yaml

VALID_METHODS = ("nearest", "linear", "cubic")
MISSIONS = ("oco3", "oco2", "oco3_sif")


class ConfigError(ValueError):
    pass


@dataclass
class RunConfig:
    store_path: str
    input_files: list[dict] = field(default_factory=list)
    stream_input_dir: str | None = None
    global_mode: bool = False
    drop_empty: bool = True
    export_path: str | None = None
    variables: dict[str, list[str]] = field(default_factory=dict)
    grid_lat_res: int = 40
    grid_lon_res: int = 40
    grid_method: str = "nearest"
    mask_scale: float = 1.0
    shuffle_partitions: int | None = None
    targets: dict[str, str] = field(default_factory=dict)
    naming: dict[str, str] = field(default_factory=dict)
    title: dict[str, str] = field(default_factory=dict)

    @classmethod
    def parse(cls, text: str) -> "RunConfig":
        try:
            raw = yaml.safe_load(text)
        except yaml.YAMLError as e:
            raise ConfigError(f"invalid YAML: {e}") from e
        if not isinstance(raw, dict):
            raise ConfigError("config must be a mapping")
        return cls.from_dict(raw)

    @classmethod
    def parse_file(cls, path: str) -> "RunConfig":
        with open(path) as f:
            return cls.parse(f.read())

    @classmethod
    def from_dict(cls, raw: dict[str, Any]) -> "RunConfig":
        out = raw.get("output")
        if not isinstance(out, dict):
            raise ConfigError("output: required mapping")
        store = out.get("local") or (out.get("s3") or {}).get("url")
        if not isinstance(store, str) or not store:
            raise ConfigError("output.local or output.s3.url: required string")

        inp = raw.get("input")
        if not isinstance(inp, dict) or not ("files" in inp or "queue" in inp or "stream" in inp):
            raise ConfigError("input: required mapping with 'files' or 'stream'")
        files: list[dict] = []
        for i, entry in enumerate(inp.get("files") or []):
            if isinstance(entry, str):
                files.append({"path": entry, "mission": "oco3"})
            elif isinstance(entry, dict) and isinstance(entry.get("path"), str):
                files.append(
                    {"path": entry["path"], "mission": entry.get("mission", "oco3")}
                )
            else:
                raise ConfigError(f"input.files[{i}]: string or {{path,...}} mapping")
        stream_dir = (inp.get("stream") or {}).get("dir") if "stream" in inp else None

        grid = raw.get("grid") or {}
        method = grid.get("method", "nearest")
        if method not in VALID_METHODS:
            raise ConfigError(f"grid.method: one of {VALID_METHODS}")
        lat_res = int(grid.get("latitude", 40))
        lon_res = int(grid.get("longitude", 40))
        if lat_res < 1 or lon_res < 1:
            raise ConfigError("grid.latitude/longitude: must be >= 1")

        # reference schema bounds mask-scaling to [1, 1.5]
        mask = float(raw.get("mask-scaling", 1.0))
        if not (1.0 <= mask <= 1.5):
            raise ConfigError("mask-scaling: must be within [1, 1.5]")

        variables: dict[str, list[str]] = {}
        for mission, dims in (raw.get("variables") or {}).items():
            if mission not in MISSIONS:
                raise ConfigError(f"variables.{mission}: unknown mission")
            names = []
            for d in dims or []:
                if isinstance(d, dict) and "name" in d:
                    names.append(str(d["name"]))
                elif isinstance(d, str):
                    names.append(d)
                else:
                    raise ConfigError(f"variables.{mission}: entries need a name")
            variables[mission] = names

        targets = {}
        for mission, path in (raw.get("target-file") or {}).items():
            if mission not in MISSIONS:
                raise ConfigError(f"target-file.{mission}: unknown mission")
            targets[mission] = str(path)

        return cls(
            store_path=store,
            input_files=files,
            stream_input_dir=stream_dir,
            global_mode=bool(out.get("global", False)),
            drop_empty=bool(out.get("drop-empty", True)),
            export_path=((out.get("cog") or {}).get("output") or {}).get("local"),
            variables=variables,
            grid_lat_res=lat_res,
            grid_lon_res=lon_res,
            grid_method=method,
            mask_scale=mask,
            shuffle_partitions=(
                int(raw["max-workers"]) if "max-workers" in raw else None
            ),
            targets=targets,
            naming=dict((out.get("naming") or {})),
            title=dict((out.get("title") or {})),
        )
