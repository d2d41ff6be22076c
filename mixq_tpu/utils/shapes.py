"""Small shared shape utilities."""


def round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m
