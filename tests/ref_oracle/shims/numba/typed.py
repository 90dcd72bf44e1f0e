class List(list):
    """numba.typed.List stand-in (plain list)."""

    @classmethod
    def empty_list(cls, item_type=None):
        return cls()


class Dict(dict):
    """numba.typed.Dict stand-in (plain dict)."""

    @classmethod
    def empty(cls, key_type=None, value_type=None):
        return cls()
