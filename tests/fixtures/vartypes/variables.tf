# Fixture corpus for tf_variable_type_mismatch: one variable per
# declared-type × default-shape class (see the entry's golden oracle).

variable "region" {
  type    = string
  default = "us-west-2"
}

variable "replicas" {
  type    = number
  default = 2
}

variable "count_str" {
  type    = number
  default = "3"
}

variable "debug" {
  type    = bool
  default = "true"
}

variable "port" {
  type    = string
  default = 8080
}

variable "zones" {
  type    = list(string)
  default = []
}

variable "tags" {
  type    = map(string)
  default = []
}

variable "flag" {
  type    = bool
  default = 1
}

variable "api_token" {
  type = string
}

variable "legacy" {
  default = "x"
}
