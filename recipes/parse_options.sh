# Minimal --flag value parser for recipe scripts (same contract as the
# reference's utils/parse_options.sh: each --foo-bar VALUE sets shell
# variable foo_bar, which must already exist).
while true; do
  case "${1:-}" in
    --*)
      name=$(echo "$1" | sed 's/^--//; s/-/_/g')
      if eval "[ -z \"\${$name+x}\" ]"; then
        echo "parse_options.sh: unknown option $1" >&2
        exit 1
      fi
      eval "$name=\"\$2\""
      shift 2
      ;;
    *) break ;;
  esac
done
