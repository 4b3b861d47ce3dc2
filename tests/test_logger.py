"""Logger (PISM ``src/util/Logger.cc``) verbosity gating."""

import io

from pism_tpu.util.logger import Logger


def test_verbosity_gating():
    buf = io.StringIO()
    lg = Logger(verbosity=2, stream=buf)
    lg.message(2, "at threshold %d", 2)
    lg.message(3, "above threshold")
    lg.message(1, "below threshold")
    out = buf.getvalue()
    assert "at threshold 2" in out
    assert "above threshold" not in out
    assert "below threshold" in out


def test_warning_and_error_always_print():
    buf = io.StringIO()
    lg = Logger(verbosity=1, stream=buf)
    lg.warning("solver retried %d times", 3)
    lg.error("boom")
    out = buf.getvalue()
    assert "WARNING: solver retried 3 times" in out
    assert "ERROR: boom" in out


def test_silent_at_verbosity_zero():
    buf = io.StringIO()
    lg = Logger(verbosity=0, stream=buf)
    lg.message(1, "hidden")
    lg.warning("hidden too")
    assert buf.getvalue() == ""
