"""Traffic-signal control: ITSCP environment, MLP controller, trainer."""
