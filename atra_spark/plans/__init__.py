"""Plans: the driver-side round loop (crawl) and read/export paths."""
