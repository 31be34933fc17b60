#!/usr/bin/env bash
# Prove the package is installable: fresh venv, editable install, import,
# CLI entry points, smoke tier.  (Round-4 verdict item #4 — the reference
# ships requirements.txt; this is our equivalent proof.)
#
# This machine has zero network egress, so the fresh venv satisfies the
# declared dependencies from the CURRENT environment's site-packages via a
# .pth bridge (venv --system-site-packages would expose only the BASE
# interpreter's site-packages, which is empty when the host env is itself
# a venv) and --no-build-isolation reuses the installed setuptools; on a
# networked machine a plain `python -m venv` + `pip install -e .`
# resolves the same pins from PyPI.
set -euo pipefail
REPO="$(cd "$(dirname "$0")/.." && pwd)"
VENV="${1:-$(mktemp -d)/lerf-venv}"

HOST_SITE="$(python -c 'import sysconfig; print(sysconfig.get_paths()["purelib"])')"
python -m venv "$VENV"
VENV_SITE="$("$VENV/bin/python" -c 'import sysconfig; print(sysconfig.get_paths()["purelib"])')"
echo "$HOST_SITE" > "$VENV_SITE/_host_env.pth"
"$VENV/bin/pip" install -e "$REPO" --no-build-isolation --quiet

"$VENV/bin/python" - <<'EOF'
import lerf_tpu, lerf_tpu.pipeline, lerf_tpu.evaluate
import lerf_tpu.ops, lerf_tpu.models, lerf_tpu.parallel, lerf_tpu.train
print("import ok:", lerf_tpu.__file__)
EOF

# console entry points resolve and parse --help
"$VENV/bin/lerf-upscale" --help > /dev/null
"$VENV/bin/lerf-serve" --help > /dev/null
"$VENV/bin/lerf-train" --help > /dev/null
echo "entry points ok"

cd "$REPO"
"$VENV/bin/python" -m pytest tests/ -m smoke -q
echo "check_install: OK ($VENV)"
