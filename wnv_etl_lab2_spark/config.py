"""Config-driven source/sink binding (reference O2).

The reference loads a flat YAML dict (`config_loader.py:4-7`,
`config/wnvoutbreak.yaml:1-6`: remote_url, local_dir, data_format,
gdb_path, proj_dir, proj_loc) and threads it through the pipeline
constructor (`run_GSheetsELT_Lab2.py:7-12`). Same contract here, with
validation and an explicit dataclass instead of a stringly dict.
"""

from __future__ import annotations

from dataclasses import dataclass, fields


@dataclass(frozen=True)
class PipelineConfig:
    remote_url: str = ""
    local_dir: str = ""
    data_format: str = "csv"
    gdb_path: str = ""  # reference naming; any table/sink root path
    proj_dir: str = ""
    proj_loc: str = ""

    @classmethod
    def from_dict(cls, d: dict) -> "PipelineConfig":
        known = {f.name for f in fields(cls)}
        unknown = set(d) - known
        if unknown:
            raise ValueError(f"unknown config keys: {sorted(unknown)}")
        # YAML empty values parse as None — keep them as '' defaults
        # rather than the literal string 'None'
        return cls(**{k: ("" if v is None else str(v)) for k, v in d.items()})


def load_config(path: str) -> PipelineConfig:
    """YAML when available (reference parity), JSON as fallback —
    no hard dependency on a YAML library."""
    with open(path) as f:
        text = f.read()
    try:
        import yaml  # type: ignore

        data = yaml.safe_load(text)
    except ImportError:
        import json

        data = json.loads(text)
    if not isinstance(data, dict):
        raise ValueError(f"config at {path} must be a mapping, got {type(data).__name__}")
    return PipelineConfig.from_dict(data)
