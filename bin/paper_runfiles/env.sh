# Common paths for the paper-protocol recipes. Override the data roots via
# environment variables (reference bin/paper_runfiles/env.sh hardcodes
# cluster paths; here everything is parameterised).
DIRNAME="$(dirname "$0")"
DIRNAME="$(realpath "$DIRNAME")"
BINDIR="$DIRNAME/.."
SRCDIR="$BINDIR/.."
CONFIGDIR="$SRCDIR/configs"
export PYTHONPATH="$SRCDIR:$PYTHONPATH"
