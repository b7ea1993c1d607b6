"""Alias of train_ft for reference-script parity.

The reference ships two drivers: run/train_ft.py (saves + exit()s after every
point-grow so an outer bash loop can restart CUDA cleanly) and
run/train_ft_nonstop.py (rebuilds the model in-process instead,
reference diff at train_ft_nonstop.py:888-910). This framework's grow is a
masked buffer update with no allocator fragmentation to dodge, so the two
entry points are the same program — kept so reference scripts translate 1:1.
"""

from .train_ft import main  # noqa: F401
from .common import options_from_cli

if __name__ == "__main__":
    main(options_from_cli())
