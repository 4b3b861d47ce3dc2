"""Model time and calendars.

The reference (PISM ``src/util/Time.cc`` + bundled calcalcs C library) keeps
model time as seconds since a reference date under a CF calendar
(``365_day``, ``360_day``, ``gregorian``, ``none``). We implement the same
semantics in pure Python; this runs on the host only (time never enters
jitted code except as a traced f64 scalar in seconds).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from .units import SEC_PER_YEAR

_DAYS_PER_MONTH_365 = (31, 28, 31, 30, 31, 30, 31, 31, 30, 31, 30, 31)


def _is_gregorian_leap(y: int) -> bool:
    return (y % 4 == 0 and y % 100 != 0) or (y % 400 == 0)


@dataclass(frozen=True)
class Calendar:
    name: str = "365_day"

    @property
    def year_length(self) -> float:
        """Length of one calendar year in seconds (mean year for gregorian)."""
        if self.name in ("365_day", "noleap"):
            return 365.0 * 86400.0
        if self.name == "360_day":
            return 360.0 * 86400.0
        if self.name in ("gregorian", "standard", "proleptic_gregorian"):
            return 365.2425 * 86400.0
        if self.name == "none":
            return SEC_PER_YEAR
        raise ValueError(f"unknown calendar {self.name!r}")

    def year_fraction(self, t_seconds: float) -> float:
        """Fraction of the year elapsed at time t (for periodic forcings)."""
        yl = self.year_length
        return (t_seconds % yl) / yl


@dataclass(frozen=True)
class Time:
    """Run-time bookkeeping: start/end, current time in seconds.

    Mirrors PISM ``pism::Time`` (``-y``/``-ys``/``-ye`` options, seconds
    internally, years at the UI).
    """

    start: float  # seconds
    end: float  # seconds
    calendar: Calendar = field(default_factory=Calendar)

    @staticmethod
    def from_years(ys: float = 0.0, ye: float = None, y: float = None,
                   calendar: str = "365_day") -> "Time":
        cal = Calendar(calendar)
        yl = cal.year_length
        if ye is None:
            ye = ys + (y if y is not None else 0.0)
        return Time(start=ys * yl, end=ye * yl, calendar=cal)

    def years(self, t_seconds: float) -> float:
        return t_seconds / self.calendar.year_length

    def seconds(self, t_years: float) -> float:
        return t_years * self.calendar.year_length

    @property
    def run_length(self) -> float:
        return self.end - self.start
