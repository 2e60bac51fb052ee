"""Canonical data-source registry.

Every batch carries a `data_source_idx` used to split losses/metrics per
source. Mirrors the reference tuple at utils/data.py:7 (order is part of
the checkpoint/config contract and must not change).
"""

DATA_SOURCES = (
    "esim", "ijrr", "mvsec", "eccd", "hqf", "unknown", "reds",
    "sportsslomo", "adobe", "youcook", "vimeo", "webvid", "evbird",
    "evaid", "hs-ergb", "openvid",
)


def source_index(name: str) -> int:
    return DATA_SOURCES.index(name.lower())


def source_name(idx: int) -> str:
    return DATA_SOURCES[idx]
