"""``python -m crawl4ai_spark`` — the reference's ``crwl`` entry
(cli.py:1466-1469 invokes the click group the same way)."""

from .cli import main

if __name__ == "__main__":
    main()
