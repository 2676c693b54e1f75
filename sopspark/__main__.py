from sopspark.cli import main

main()
