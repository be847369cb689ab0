"""The --py-files artifact must be importable via zipimport — what the
executors actually do with it on a cluster (north rule: ships as
spark-submit --py-files)."""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_pyfiles_zip_importable(tmp_path):
    sys.path.insert(0, os.path.join(REPO, "scripts"))
    try:
        from make_pyfiles import build
    finally:
        sys.path.pop(0)

    zip_path = build(str(tmp_path / "pkg.zip"))
    assert os.path.getsize(zip_path) > 10_000

    # import from the zip ONLY (cwd = tmp so the repo checkout can't
    # shadow it), touching the modules the job entry needs
    probe = (
        "import sys\n"
        f"sys.path.insert(0, {zip_path!r})\n"
        "from opengauss_tools_datachecker_performance_spark.plans.runner import validate_docs\n"
        "from opengauss_tools_datachecker_performance_spark.__main__ import build_parser\n"
        "import opengauss_tools_datachecker_performance_spark as pkg\n"
        "assert pkg.__file__.startswith(sys.path[0]), pkg.__file__\n"
        "args = build_parser().parse_args(['--source', 'x.parquet', '--report-dir', 'out'])\n"
        "print('ZIPIMPORT_OK', args.source)\n"
    )
    out = subprocess.run(
        [sys.executable, "-c", probe],
        capture_output=True,
        text=True,
        cwd=str(tmp_path),
        timeout=120,
    )
    assert out.returncode == 0, out.stderr
    assert "ZIPIMPORT_OK x.parquet" in out.stdout


def test_pyfiles_zip_reproducible(tmp_path):
    sys.path.insert(0, os.path.join(REPO, "scripts"))
    try:
        from make_pyfiles import build
    finally:
        sys.path.pop(0)
    a = build(str(tmp_path / "a.zip"))
    b = build(str(tmp_path / "b.zip"))
    assert open(a, "rb").read() == open(b, "rb").read()
