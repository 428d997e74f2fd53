"""Pipeline invariant errors (reference: /root/reference/synth/errors.py)."""

from __future__ import annotations


class SpecificDisciplineParentMismatch(Exception):
    """A specific discipline name appears in multiple rounds with different
    parent disciplines (errors.py:3-19; raised at etl.py:310-312)."""

    def __init__(self, details: str):
        super().__init__(
            f"Specific discipline duplicated with mismatched parents: {details}"
        )


class DuplicateUserGUIDError(Exception):
    """users.csv contains the same GUID twice (errors.py:22-29; raised at
    resources.py:420-421)."""

    def __init__(self, guids):
        super().__init__(f"Duplicate user GUID(s) in users resource: {guids}")


class AmbiguousCountryError(Exception):
    """An institution row's country code matched zero or multiple Country
    rows (the reference's ``.one()`` uniqueness check, etl.py:600)."""

    def __init__(self, details: str):
        super().__init__(f"Country lookup did not match exactly one row: {details}")
