"""Engine configuration — reference O4 parity (/root/reference/
parquet_converter/config.py:18-183 Pydantic Config; :347-441
file-load + env-var overlay + save).

Re-expressed as a plain dataclass (no Pydantic dependency): JSON (and
YAML when available) file load, PCS_* environment overlay, validation,
save. On a cluster the same values arrive via ``spark-submit --conf``
/ CLI flags; this object is the single source of engine knobs either
way.
"""

from __future__ import annotations

import dataclasses
import json
import os

_ENV_PREFIX = "PCS_"


@dataclasses.dataclass
class EngineConfig:
    codec: str = "auto"                 # auto | plain | dict | rle | forbp | delta | dtrans | wdict | fsst
    salt_rows: int = 65_536             # turn_idx salting block (skew bound)
    chunk_rows: int = 65_536            # rows per encoded block
    num_buckets: int | None = None      # None → planned from row count
    sample_rows: int = 1_024            # cost-model sample per chunk-column
    resume: bool = True
    parquet_compression: str = "snappy" # reference default (config.py:175)
    dt_formats: list[str] = dataclasses.field(default_factory=list)
    time_bucket: str | None = None      # None | hour | day | week | seconds-int-as-str

    _CODECS = {"auto", "plain", "dict", "rle", "forbp", "delta", "dtrans", "wdict", "fsst"}

    def validate(self) -> "EngineConfig":
        if self.codec not in self._CODECS:
            raise ValueError(f"unknown codec {self.codec!r}; one of {sorted(self._CODECS)}")
        if self.salt_rows <= 0 or self.chunk_rows <= 0 or self.sample_rows <= 0:
            raise ValueError("salt_rows/chunk_rows/sample_rows must be positive")
        if self.num_buckets is not None and self.num_buckets <= 0:
            raise ValueError("num_buckets must be positive or None")
        if self.time_bucket is not None:
            from .partitioning import resolve_time_bucket

            resolve_time_bucket(self.time_bucket)
        return self

    def resolved_time_bucket(self) -> int | None:
        """time_bucket as seconds (or None), for encode_table."""
        from .partitioning import resolve_time_bucket

        return resolve_time_bucket(self.time_bucket)

    @classmethod
    def load(cls, path: str | None = None, env: dict | None = None) -> "EngineConfig":
        """File (JSON/YAML) → PCS_* env overlay → validate.
        Mirrors the reference's load_config precedence (config.py:347-401)."""
        data: dict = {}
        if path:
            with open(path) as f:
                text = f.read()
            if path.endswith((".yaml", ".yml")):
                try:
                    import yaml  # type: ignore

                    data = yaml.safe_load(text) or {}
                except ImportError as e:
                    raise RuntimeError("YAML config requires pyyaml; use JSON") from e
            else:
                data = json.loads(text)
        env = dict(os.environ if env is None else env)
        fields = {f.name: f for f in dataclasses.fields(cls) if not f.name.startswith("_")}
        for name, f in fields.items():
            key = _ENV_PREFIX + name.upper()
            if key in env:
                raw = env[key]
                if f.type in ("int", "int | None"):
                    data[name] = int(raw)
                elif f.type == "bool":
                    data[name] = raw.lower() in ("1", "true", "yes")
                elif f.type == "list[str]":
                    data[name] = [s for s in raw.split(",") if s]
                else:
                    data[name] = raw
        known = {k: v for k, v in data.items() if k in fields}
        unknown = set(data) - set(known)
        if unknown:
            raise ValueError(f"unknown config keys: {sorted(unknown)}")
        return cls(**known).validate()

    def save(self, path: str) -> None:
        """Save-config roundtrip (reference config.py:404-441)."""
        with open(path, "w") as f:
            json.dump(dataclasses.asdict(self), f, indent=2)
