"""The driver-window rotation arithmetic must stay sane (tools/check_window.py).

A broken rotation silently wastes an entire driver round — every new
query would miss its CORRECTNESS row. No SparkSession needed.
"""

from tools.check_window import main as check_window_main


def test_driver_window_arithmetic():
    assert check_window_main() == 0
