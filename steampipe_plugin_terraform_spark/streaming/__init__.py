from .events import hourly_counts_stream, sessionized_stream, deduped_stream
from .stateful import running_user_totals
from .watch import watch_terraform_blocks

__all__ = [
    "watch_terraform_blocks",
    "hourly_counts_stream",
    "sessionized_stream",
    "deduped_stream",
    "running_user_totals",
]
