# Cross-file half of the vartypes corpus: collection/constructor types
# and the numeric-string coercion edge cases.

variable "names" {
  type    = set(string)
  default = ["a", "b"]
}

variable "opts" {
  type    = object({ mode = string })
  default = {}
}

variable "retries" {
  type    = number
  default = "many"
}

variable "offset" {
  type    = number
  default = "-1.5"
}
