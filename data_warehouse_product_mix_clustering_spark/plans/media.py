"""media queries — populated in this round; see registry.all_queries()."""
