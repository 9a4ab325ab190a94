variable "n" {
  type = number
}

variable "names" {
  type = set(string)
}

resource "aws_instance" "c3" {
  count         = 3
  instance_type = "t3.micro"
}

resource "aws_instance" "cv" {
  count         = var.n
  instance_type = "t3.micro"
}

resource "aws_subnet" "fe_map" {
  for_each = {
    a = "10.0.1.0/24"
    b = "10.0.2.0/24"
    c = "10.0.3.0/24"
  }
  cidr_block = each.value
}

resource "aws_subnet" "fe_list" {
  for_each   = toset(["x", "y"])
  cidr_block = "10.0.0.0/24"
}

resource "aws_instance" "fe_var" {
  for_each      = var.names
  instance_type = "t3.micro"
}

resource "aws_s3_bucket" "single" {
  bucket = "one-instance"
}
