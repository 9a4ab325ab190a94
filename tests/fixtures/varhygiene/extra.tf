variable "legacy_ami" {
  default = "ami-0legacy"
}

variable "api_token" {
  type        = string
  description = "Service API token"
  # sensitive = true
}
