from .binlog import ChangeFilter, read_changelog

__all__ = ["ChangeFilter", "read_changelog"]
