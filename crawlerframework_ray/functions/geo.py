"""Geo-lookup extractor (the T6 extractor family's geo slot).

The reference resolved location mentions against a geo database inside
its row callback (crawler/extractors/extractor.py:129-141
``extract_geo`` — place-name lookup → country/lat/lon columns). Here
the gazetteer is the broadcast-dict pattern (utils.py:47-76 gender-dict
analogue): a small place→(country, lat, lon) table "loaded" once per
actor in ``__init__`` and applied per batch in ``__call__``.

Coordinates are fixed-point int64 micro-degrees (``lat_e6``/``lon_e6``)
so the DuckDB oracle reproduces values bit-for-bit — float columns
would hash unstably across engines.
"""

from __future__ import annotations

import pyarrow as pa

# place → (ISO country, lat microdeg, lon microdeg); keys match the NER
# LOC gazetteer so the same planted corpus exercises both stages
GAZETTEER: dict[str, tuple[str, int, int]] = {
    "Paris": ("FR", 48_856_600, 2_352_200),
    "London": ("GB", 51_507_200, -127_500),
    "Tokyo": ("JP", 35_676_200, 139_650_300),
    "Oslo": ("NO", 59_913_900, 10_752_200),
    "Lima": ("PE", -12_046_400, -77_042_800),
}


class GeoLookupStage:
    """map_batches callable: ``text`` → ``n_locs`` (gazetteer-token
    count), ``first_loc`` (first mention or ''), resolved ``country`` /
    ``lat_e6`` / ``lon_e6`` (0 when unresolved). Gazetteer held once
    per actor — swapping in a real geo DB touches only ``_load``."""

    def __init__(self, text_column: str = "text"):
        self.text_column = text_column
        self.gazetteer = self._load()

    @staticmethod
    def _load() -> dict[str, tuple[str, int, int]]:
        # per-actor load step (a real implementation opens the geo DB /
        # index here)
        return dict(GAZETTEER)

    def __call__(self, batch: pa.Table) -> pa.Table:
        gz = self.gazetteer
        n_locs, first_loc, country, lat, lon = [], [], [], [], []
        for t in batch.column(self.text_column).to_pylist():
            hits = [w for w in t.split(" ") if w in gz]
            n_locs.append(len(hits))
            if hits:
                c, la, lo = gz[hits[0]]
                first_loc.append(hits[0])
            else:
                c, la, lo = "", 0, 0
                first_loc.append("")
            country.append(c)
            lat.append(la)
            lon.append(lo)
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_locs": pa.array(n_locs, pa.int64()),
                "first_loc": pa.array(first_loc, pa.string()),
                "country": pa.array(country, pa.string()),
                "lat_e6": pa.array(lat, pa.int64()),
                "lon_e6": pa.array(lon, pa.int64()),
            }
        )
