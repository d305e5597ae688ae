"""Shared ops exports."""
from .skew_join import skew_join
from .diagnostics import partition_stats, count_per_partition, timed_save
