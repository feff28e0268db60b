"""Log subsystem parity (/root/reference/src/Logging.cpp, unix.cpp:36).

Checks the console behaviors VERDICT flagged as missing: color palette,
progress-line rewind, the >100-warnings abort (Logging.cpp:211-216), and
Log.Error terminating with "Terminating" (Logging.cpp:218-229).
"""

import io
import sys

import pytest

from ngmlr_tpu.log import Log


@pytest.fixture
def errbuf():
    buf = io.StringIO()
    Log.configure(stream=buf)
    yield buf
    Log.configure()


def test_plain_message(errbuf):
    Log.message("hello %d", 7)
    assert errbuf.getvalue() == "hello 7\n"


def test_color_palette_matches_unix_cpp(errbuf):
    # unix.cpp:36 colors[]: message "0", warning "0;33", error "0;31",
    # green "0;32"; reset after every line (Logging.cpp:94-102)
    Log.configure(color=True, stream=errbuf)
    Log.message("m")
    Log.green("g")
    try:
        Log.warning("w")
    except SystemExit:
        pass
    out = errbuf.getvalue()
    assert "\033[0m" in out
    assert "\033[0mm\033[0m\n" in out or "\033[0m" + "m" in out
    assert "\033[0;32mg\033[0m\n" in out
    assert "\033[0;33mw\033[0m\n" in out


def test_progress_rewind(errbuf):
    # rwl(): the write after a progress line erases it with ESC[A ESC[2K
    # (Logging.cpp:73-77)
    Log.progress("Processed: 10")
    Log.progress("Processed: 20")
    out = errbuf.getvalue()
    assert out == "Processed: 10\n\033[A\033[2KProcessed: 20\n"


def test_warning_cap_aborts(errbuf):
    # Logging.cpp:211-216: >100 warnings prints the report-this notice
    # and exits 1
    with pytest.raises(SystemExit) as e:
        for i in range(200):
            Log.warning("w%d", i)
    assert e.value.code == 1
    out = errbuf.getvalue()
    assert out.count("\n") >= 101
    assert "Max number of warnings reached!" in out
    assert "github.com/Cibiv/NextGenMap/issues" in out


def test_error_terminates(errbuf):
    with pytest.raises(SystemExit) as e:
        Log.error("bad thing %s", "happened")
    assert e.value.code == 1
    assert errbuf.getvalue() == "bad thing happened\nTerminating\n"


def test_verbose_gated(errbuf):
    Log.verbose("hidden")
    Log.configure(verbose=True, stream=errbuf)
    Log.verbose("shown")
    assert errbuf.getvalue() == "shown\n"


def test_cli_done_line_format(tmp_path):
    """The final summary follows main.cpp:109's format."""
    import re
    import subprocess

    import os
    here = os.path.dirname(os.path.abspath(__file__))
    fa = os.path.join(here, "data", "test_2", "ref_chr21_20kb.fa")
    q = os.path.join(here, "data", "test_2", "reads_100_2200bp.fa")
    if not (os.path.exists(fa) and os.path.exists(q)):
        pytest.skip("test data not present")
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    r = subprocess.run(
        [sys.executable, "-m", "ngmlr_tpu", "-r", fa, "-q", q,
         "-o", str(tmp_path / "o.sam"), "--skip-write"],
        capture_output=True, text=True, env=env, timeout=600)
    assert r.returncode == 0, r.stderr
    assert re.search(
        r"Done \(\d+ reads mapped \(\d+\.\d\d%\), \d+ reads not mapped, "
        r"\d+ lines written\)\(elapsed: \d+m, \d+ r/s\)", r.stderr), r.stderr
