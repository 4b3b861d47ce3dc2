"""Calendar/reference-date fidelity (VERDICT r4 #6; reference
src/util/Time.cc + calcalcs): dated CF time axes in forcing files align to
model time under the run calendar, and output time axes carry the
configured calendar + reference date."""

import numpy as np
import pytest

from pism_tpu import Config
from pism_tpu.util.timecal import (Calendar, Time, date_to_seconds,
                                   parse_time_units, seconds_to_date)

pytestmark = pytest.mark.smoke


def test_date_arithmetic_calendars():
    # 365_day: no leap years
    assert date_to_seconds("365_day", "2-1-1") == 365 * 86400.0
    # 360_day: 30-day months
    assert date_to_seconds("360_day", "1-2-1") == 30 * 86400.0
    # gregorian: 2000 is a leap year
    d0 = date_to_seconds("gregorian", "2000-1-1")
    d1 = date_to_seconds("gregorian", "2001-1-1")
    assert (d1 - d0) / 86400.0 == 366
    # round trip through seconds_to_date
    for cal in ("365_day", "360_day", "gregorian"):
        for date in ("1850-7-15", "2024-2-28"):
            y, m, d, _ = seconds_to_date(cal, date_to_seconds(cal, date))
            yy, mm, dd = (int(x) for x in date.split("-"))
            if cal == "360_day" and dd > 30:
                continue
            assert (y, m, d) == (yy, mm, dd), (cal, date)
    # gregorian leap day survives the round trip
    y, m, d, _ = seconds_to_date(
        "gregorian", date_to_seconds("gregorian", "2024-2-29"))
    assert (y, m, d) == (2024, 2, 29)


def test_parse_time_units_alignment():
    # dated axis: offset = distance from the model reference date
    s, o = parse_time_units("days since 2000-2-1", "gregorian", "2000-1-1")
    assert s == 86400.0 and o == 31 * 86400.0
    s, o = parse_time_units("hours since 2000-1-2", "365_day", "2000-1-1")
    assert s == 3600.0 and o == 86400.0
    # years-since uses the calendar year length
    s, o = parse_time_units("years since 1-1-1", "360_day", "1-1-1")
    assert s == 360 * 86400.0 and o == 0.0
    # undated fallbacks keep the historical package conventions
    s, o = parse_time_units("years", "gregorian", "1-1-1")
    assert s == 3.15569259747e7 and o == 0.0
    s, o = parse_time_units("seconds", "365_day", "1-1-1")
    assert s == 1.0 and o == 0.0


def test_scalar_forcing_dated_axis(tmp_path):
    from pism_tpu.io.nc4 import File
    from pism_tpu.util.forcing import ScalarForcing

    path = str(tmp_path / "delta_T.nc")
    with File(path, "w") as f:
        f.define_dimension("time", 3, np.array([0.0, 31.0, 59.0]),
                           attrs={"units": "days since 2000-2-1",
                                  "calendar": "gregorian"})
        f.write("delta_T", np.array([1.0, 2.0, 3.0]), ("time",),
                {"units": "K"})
    sf = ScalarForcing.from_file(path, "delta_T", calendar="gregorian",
                                 reference_date="2000-1-1")
    t = np.asarray(sf.times) / 86400.0
    assert t.tolist() == [31.0, 62.0, 90.0]
    # model time on 2000-03-03 (day 62 from the reference date) sees 2.0
    assert float(sf(62 * 86400.0)) == pytest.approx(2.0)


def test_time_from_config_and_output_axis(tmp_path):
    cfg = Config({"time.calendar": "gregorian",
                  "time.reference_date": "2000-1-1",
                  "time.start": 0.0, "time.run_length": 10.0})
    t = Time.from_config(cfg)
    assert t.calendar.name == "gregorian"
    assert t.cf_units == "seconds since 2000-1-1"
    assert t.date_string(0.0) == "2000-01-01"
    # 400 days into a gregorian run: 2001-02-04 (2000 is a leap year)
    assert t.date_string(400 * 86400.0) == "2001-02-04"

    # checkpoint time axis carries the configured calendar
    import jax.numpy as jnp

    from pism_tpu import Grid, new_geometry
    from pism_tpu.io import checkpoint as ckpt
    from pism_tpu.io.nc4 import File
    from pism_tpu.state import ModelState

    grid = Grid(Mx=6, My=6, Lx=10e3, Ly=10e3, Mz=3, Lz=100.0)
    state = ModelState(geometry=new_geometry(
        jnp.zeros(grid.shape2), jnp.zeros(grid.shape2)))
    path = str(tmp_path / "out.nc")
    ckpt.save_state(path, state, grid, 0.0, config=cfg)
    with File(path, "r") as f:
        attrs = dict(f.read_attrs("time"))
    units = attrs["units"]
    cal = attrs["calendar"]
    if isinstance(units, bytes):
        units = units.decode()
    if isinstance(cal, bytes):
        cal = cal.decode()
    assert units == "seconds since 2000-1-1"
    assert cal == "gregorian"
