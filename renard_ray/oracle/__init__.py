"""Golden single-process oracle + triple P/R scorer."""
