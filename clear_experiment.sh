#!/bin/bash
# Remove an experiment's logs, checkpoint list and checkpoints
# (reference clear_experiment.sh). Usage: ./clear_experiment.sh <name>

if [ -z "$1" ]; then
    echo "Usage: $0 <experiment_name>"
    exit 1
fi

name=$1
for target in "tensorboard_logs/${name}" "checkpoints/${name}"; do
    if [ -d "$target" ]; then
        echo "Removing directory: $target"
        rm -r "$target"
    fi
done
if [ -f "ckpt_paths/${name}.txt" ]; then
    echo "Removing file: ckpt_paths/${name}.txt"
    rm "ckpt_paths/${name}.txt"
fi
echo "Cleanup for experiment '${name}' complete."
