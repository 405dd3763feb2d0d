#!/bin/bash
# Run a TPU python command, retrying while the axon tunnel re-registers.
for i in 1 2 3 4 5 6; do
  out=$("$@" 2>&1); rc=$?
  if echo "$out" | grep -q "Unable to initialize backend 'axon'"; then
    echo "[tpu_retry] axon backend unavailable (attempt $i); sleeping 45s" >&2
    sleep 45
    continue
  fi
  echo "$out"; exit $rc
done
echo "$out"; exit 1
