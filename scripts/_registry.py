"""Shared sequence registry for the result-formatting scripts."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from v2v_tpu.eval.harness import SEQUENCES  # noqa: F401,E402
from v2v_tpu.eval.flow_harness import (FLOW_METRICS,  # noqa: F401,E402
                                       FLOW_SEQUENCES)
