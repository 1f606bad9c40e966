# Kaldi-style --option value parsing (reference: utils/parse_options.sh).
# Sets shell variables from --foo-bar value pairs (foo_bar=value).

while true; do
  case "${1:-}" in
    --*)
      name=$(echo "$1" | sed 's/^--//; s/-/_/g')
      if [ $# -lt 2 ]; then
        echo "parse_options: missing value for $1" >&2
        exit 1
      fi
      eval "$name=\"\$2\""
      shift 2
      ;;
    *)
      break
      ;;
  esac
done
