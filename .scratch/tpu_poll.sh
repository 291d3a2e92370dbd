#!/bin/bash
# Poll for TPU recovery, then run the consolidated measurement session.
cd /root/repo/.scratch
for i in $(seq 1 60); do
  if timeout 50 python -c "import jax; assert jax.devices()" 2>/dev/null; then
    echo "TPU BACK at attempt $i $(date)" 
    timeout 1500 python tpu_session.py 2>&1 | grep -v WARNING
    exit 0
  fi
  sleep 60
done
echo "TPU never recovered"
