#!/bin/bash
# Crash auto-restart loop (reference: repeat.sh).
# Re-executes the given training command until it exits with status 1
# (deliberate stop). NaN crashes exit 255 and resume from the last
# checkpoint in --dir; each restart gets a fresh random seed so the run can
# escape the bad trajectory (doc/guide.tex:178-179 semantics).
while true; do
    eval "$@"
    code=$?
    if [ $code -eq 1 ]; then
        echo "repeat.sh: exit code 1, stopping"
        break
    fi
    echo "repeat.sh: exit code $code, restarting..."
    sleep 1
done
