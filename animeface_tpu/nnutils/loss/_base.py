'''Loss base class (reference `nnutils/loss/_base.py:1`).'''


class Loss:
    def __init__(self, return_all: bool = False) -> None:
        self.return_all = return_all
