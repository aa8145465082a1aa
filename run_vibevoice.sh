#!/bin/sh
# VibeVoice-TPU launcher (POSIX port of the reference's run_vibevoice.bat):
# activates a local venv if present, warns about a missing .env, then starts
# the flagship app.  Pass --lod for load-on-demand (model loads on first
# request instead of at startup); all other args go through unchanged.

set -e
cd "$(dirname "$0")"

if [ -f "venv/bin/activate" ]; then
    echo "Activating virtual environment..."
    # shellcheck disable=SC1091
    . venv/bin/activate
fi

if [ ! -f ".env" ] && [ -f ".env-sample" ]; then
    echo "Warning: .env not found — Script-AI features need API keys."
    echo "  cp .env-sample .env   # then fill in the keys"
    echo
fi

echo "========================================"
echo "VibeVoice will be available at:"
echo "http://localhost:${VIBEVOICE_PORT:-7860}   (use --port to change)"
echo "========================================"
echo
echo "Note: attention falls back automatically (pallas -> xla) on hardware"
echo "without TPU Pallas support."
echo

exec python -m vibevoice_tpu.apps.gradio_app "$@"
