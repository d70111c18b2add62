"""Engine configuration (S12): typed, validated, env-var driven — the
convict schema analogue (config.js:4-54).

The reference validates a declared env schema at startup
(``convict(...).validate()``); here a frozen dataclass with explicit
parsing does the same: every field has a type, a default, and a
validation error that names the variable. The hashtag seed list is a CSV
env var split (posts-from-hashtags.js:365, F2).
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field


class ConfigError(ValueError):
    pass


def _int_env(env: dict, key: str, default: int, lo: int, hi: int) -> int:
    raw = env.get(key)
    if raw is None:
        return default
    try:
        val = int(raw)
    except ValueError as exc:
        raise ConfigError(f"{key} must be an integer, got {raw!r}") from exc
    if not lo <= val <= hi:
        raise ConfigError(f"{key} must be in [{lo}, {hi}], got {val}")
    return val


@dataclass(frozen=True)
class EngineConfig:
    env_name: str = "development"          # config.js env
    hashtags: tuple[str, ...] = ()         # CSV seed list
    dev_limit: int | None = 1              # P14 thinning (None in prod)
    fetch_interval_s: float = 10.0         # E4 politeness (10 prod / 1 dev)
    followers_per_run: int = 10            # extend-followers limit
    max_labels: int = 10                   # labels.js:59
    blocklist: tuple[str, ...] = field(default_factory=tuple)

    @classmethod
    def from_env(cls, env: dict | None = None) -> "EngineConfig":
        env = dict(os.environ if env is None else env)
        name = env.get("ETL_ENV", "development")
        if name not in ("development", "production", "test"):
            raise ConfigError(f"ETL_ENV must be development|production|test, got {name!r}")
        prod = name == "production"
        hashtags = tuple(h.strip() for h in env.get("ETL_HASHTAGS", "").split(",") if h.strip())
        blocklist = tuple(b.strip() for b in env.get("ETL_BLOCKLIST", "").split(",") if b.strip())
        return cls(
            env_name=name,
            hashtags=hashtags,
            dev_limit=None if prod else 1,
            fetch_interval_s=10.0 if prod else 1.0,
            followers_per_run=_int_env(env, "ETL_FOLLOWERS_PER_RUN", 10 if prod else 1, 1, 1000),
            max_labels=_int_env(env, "ETL_MAX_LABELS", 10, 1, 100),
            blocklist=blocklist,
        )
