"""autopep8 stand-in (notebook templates only; not exercised)."""


def fix_code(code, *a, **k):
    return code
