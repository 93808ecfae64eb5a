"""Sources: synthetic Common-Crawl-style pages, parquet readers, zone fixtures."""
